#!/usr/bin/env python3
"""Machine-level scaling CONTROL for the north-rule evidence: pure-CPU
integer hashing in N independent processes (no Spark, no JVM, no shared
state) at two process counts, with /proc/stat steal deltas.

If the CONTROL itself scales sub-linearly from 8 to 32 processes, the
ceiling is the sandbox's virtual-CPU provisioning (host SMT pairing /
oversubscription — invisible to guest lscpu, which claims 32 independent
cores), not the code under test. Run a few times and take per-leg best.

Usage: python3 tools/cpu_scaling_control.py [reps=3]
"""
import multiprocessing as mp
import sys, time


def spin(n):
    x = 0
    h = 1469598103934665603
    for i in range(n):
        h = (h ^ i) * 1099511628211 % (1 << 64)
        x += h & 7
    return x


def measure(procs, n=6_000_000):
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(spin, [n] * procs)
    return procs * n / (time.time() - t0)


def steal():
    return int(open("/proc/stat").readline().split()[8])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best = {8: 0.0, 32: 0.0}
    for r in range(reps):
        for procs in (8, 32):
            s0 = steal()
            thr = measure(procs)
            ds = (steal() - s0) / 100.0
            best[procs] = max(best[procs], thr)
            print(f"rep {r} procs={procs:2d} {thr/1e6:8.1f} Mops/s steal={ds:.1f}s")
    eff = (best[32] / best[8]) / 4
    print(f"best: 8->{best[8]/1e6:.1f} 32->{best[32]/1e6:.1f} Mops/s; "
          f"machine pure-CPU 8->32 efficiency = {eff:.3f}")


if __name__ == "__main__":
    main()
