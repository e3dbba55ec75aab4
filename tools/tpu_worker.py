"""Persistent TPU worker: pays the tunnel session-init once, then executes
job files dropped into /tmp/tpu_jobs/*.py, writing <name>.out next to them."""
import glob, io, os, sys, time, traceback, contextlib
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
print("WORKER READY devices:", jax.devices(), flush=True)
open("/tmp/tpu_jobs/READY", "w").write("ok")
seen = set()
while True:
    jobs = sorted(glob.glob("/tmp/tpu_jobs/*.py"))
    for job in jobs:
        out_fn = job[:-3] + ".out"
        # skip both already-run-this-process and leftovers from a previous
        # worker (their .out already exists) — re-running stale jobs can
        # wedge the device session
        if job in seen or os.path.exists(out_fn):
            continue
        seen.add(job)
        buf = io.StringIO()
        t0 = time.time()
        try:
            src = open(job).read()
            with contextlib.redirect_stdout(buf):
                exec(compile(src, job, "exec"), {"np": np, "jax": jax})
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "FAIL"
        with open(out_fn, "w") as f:
            f.write(f"[{status} {time.time()-t0:.1f}s]\n" + buf.getvalue())
    if os.path.exists("/tmp/tpu_jobs/STOP"):
        break
    time.sleep(2)
