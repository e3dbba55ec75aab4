from centroflye_tpu.ops.myers import (  # noqa: F401
    build_peq,
    myers_distance_batch,
    edit_distance_oracle,
)
