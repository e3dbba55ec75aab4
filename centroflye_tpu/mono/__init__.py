from centroflye_tpu.mono.monostring import MonoString, GAP  # noqa: F401
from centroflye_tpu.mono.sd_parser import SDReport  # noqa: F401
