"""Reproduces the multi-worker allocator contention OPTIMIZATION_r06.md
describes, without Spark: N processes running the rolling-hash kernel
over fresh large numpy buffers.  Usage:
  python scripts/probe_allocator_contention.py <nproc> [tokens_per_batch]
Compare nproc=32 at the default 10.5M tokens (84 MB scratch, heavy sys
time) vs 2M tokens (retained heap, ~6x less kernel time).
"""
import sys, time, os
import numpy as np
sys.path.insert(0,"/root/repo")
from multiprocessing import Process

N = 10_500_000  # tokens per batch (the real batch size)
def work(reps, n):
    sys.path.insert(0,"/root/repo")
    from gorilla_stream_spark.textops import _rolling_hashes
    rng = np.random.default_rng(os.getpid())
    t0=time.time(); tcpu0=os.times()
    for _ in range(reps):
        flat = rng.integers(0, 50000, n).astype(np.int64)  # fresh 84MB each rep
        wh = _rolling_hashes(flat, n, 50, 0x9E3779B97F4A7C15)
        del flat, wh
    t=os.times()
    print(f"pid {os.getpid()} wall {time.time()-t0:.2f} user {t.user-tcpu0.user:.2f} sys {t.system-tcpu0.system:.2f}", flush=True)

if __name__ == "__main__":
    nproc = int(sys.argv[1]); n = int(sys.argv[2]) if len(sys.argv)>2 else N
    ps = [Process(target=work, args=(6, n)) for _ in range(nproc)]
    t0=time.time()
    for p in ps: p.start()
    for p in ps: p.join()
    print(f"nproc={nproc} n={n} TOTAL {time.time()-t0:.2f}")
