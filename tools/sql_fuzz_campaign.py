"""Offline differential-fuzz campaign: sweep fresh seed bases.

Runs the sqlite differential suite (tests/test_fuzz_sqlite.py) repeatedly
with SEQUILA_FUZZ_SEED_BASE varied, so every case generates brand-new
queries each round.  Any divergence fails that round's pytest run and the
failing seed base is printed for reproduction:

    python tools/sql_fuzz_campaign.py [rounds] [queries_per_case]
    SEQUILA_FUZZ_SEED_BASE=<base> python -m pytest tests/test_fuzz_sqlite.py
"""

import os
import subprocess
import sys
import time


def main(rounds: int = 10, n_queries: int = 40) -> int:
    root = os.path.join(os.path.dirname(__file__), "..")
    t0 = time.time()
    start = int(os.environ.get("SEQUILA_FUZZ_CAMPAIGN_START", "20000"))
    for i in range(rounds):
        base = start + i * 1000
        env = dict(
            os.environ,
            SEQUILA_FUZZ_SEED_BASE=str(base),
            SEQUILA_FUZZ_N=str(n_queries),
            JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"),
        )
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_fuzz_sqlite.py",
             "-q", "--no-header", "-x"],
            cwd=root, env=env, capture_output=True, text=True,
        )
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        print(f"base={base}: {tail}", flush=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(f"DIVERGENCE at SEQUILA_FUZZ_SEED_BASE={base}", flush=True)
            return 1
    print(f"CAMPAIGN PASSED: {rounds} rounds x ~21 cases x {n_queries} queries "
          f"in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sys.exit(main(rounds, nq))
