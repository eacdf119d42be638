"""Measure how much concurrent CPU this machine actually delivers.

Fixed per-process work, increasing process counts: on a machine with
C真 real deliverable cores, wall time stays flat up to C真 and grows
linearly beyond. On virtualized/overcommitted hosts the guest may
advertise more vCPUs than the hypervisor will schedule concurrently —
which caps any measured N→4N scaling efficiency below the textbook
value regardless of how well the job itself scales. Run this probe
alongside scaling benchmarks and interpret them against its ceiling.

    python tools/cpu_capacity_probe.py
"""

import json
import multiprocessing as mp
import time


def burn(_):
    x = 0
    for i in range(16_000_000):
        x += i * i
    return x


def main():
    base = None
    out = {}
    for n in (1, 2, 4, 8, 16, 24, 32):
        with mp.Pool(n) as p:
            t0 = time.time()
            p.map(burn, range(n))
            dt = time.time() - t0
        if base is None:
            base = dt
        # aggregate throughput in "core-equivalents"
        out[n] = {"wall_s": round(dt, 3),
                  "slowdown": round(dt / base, 3),
                  "delivered_cores": round(n * base / dt, 1)}
        print(n, out[n])
    pairs = {}
    for small, big in ((2, 8), (4, 16), (8, 32)):
        if small in out and big in out:
            ceiling = round(
                (out[big]["delivered_cores"] / out[small]["delivered_cores"])
                / (big / small), 3)
            pairs[f"{small}->{big}"] = ceiling
    print(json.dumps({"efficiency_ceiling_by_pair": pairs}))


if __name__ == "__main__":
    main()
