#!/usr/bin/env python
"""Driver-validation staleness report.

For every query in ``__spark_entry__.queries()``: which driver round
last recorded a CORRECTNESS row for it, and whether the source files
behind it have changed since that round's snapshot commit.  A row whose
files changed after its last driver check is "locally green, driver
stale" — exactly the silent-regression window VERDICT r03 flagged
(65 previously-green queries went un-revalidated through a round that
edited their source files).

Round snapshots: the driver commits "round N: verdict/..." AFTER
generating CORRECTNESS_r0N.json, so the code state the round validated
is that commit's PARENT.  Files per query: the module defining the
query function plus every ``openetlagent_spark`` module it (statically)
imports — an over-approximation is fine; false-stale rows just get
re-checked locally.

Usage:  python scripts/staleness.py [--markdown]
"""

from __future__ import annotations

import inspect
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout


def round_snapshots() -> dict[int, str]:
    """round number -> commit sha of the code state that round validated."""
    out = {}
    for line in git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m:
            n = int(m.group(1))
            if n not in out:  # newest first; keep the first (latest) hit
                out[n] = git("rev-parse", f"{sha}^").strip()
    return out


def query_files() -> dict[str, set[str]]:
    """query name -> repo-relative source files whose edits invalidate it."""
    # use the raw registry, not __spark_entry__.queries() — the entry
    # module wraps every callable (UTC pin), which would point
    # getsourcefile at the wrapper instead of the query definition
    from openetlagent_spark.plans import HARNESS_QUERIES

    files: dict[str, set[str]] = {}
    for name, fn in HARNESS_QUERIES.items():
        mods = set()
        try:
            src_file = inspect.getsourcefile(fn)
            src = inspect.getsource(fn)
        except (TypeError, OSError):
            src_file, src = None, ""
        deps = {os.path.relpath(src_file, ROOT)} if src_file else set()
        # modules the function body imports (the ``from ..functions.x
        # import`` pattern every plans/ query uses)
        for m in re.finditer(r"from (\.\.?[\w.]*|openetlagent_spark[\w.]*) import", src):
            mods.add(m.group(1))
        for mod in mods:
            rel = mod.lstrip(".").replace(".", "/")
            for cand in (
                f"openetlagent_spark/{rel}.py",
                f"openetlagent_spark/functions/{rel}.py",
                f"openetlagent_spark/{rel}/__init__.py",
            ):
                if os.path.exists(os.path.join(ROOT, cand)):
                    deps.add(cand)
                    break
        files[name] = deps
    return files


def last_round_checked() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(os.listdir(ROOT)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        for q in json.load(open(os.path.join(ROOT, path))):
            out[q] = max(out.get(q, 0), n)
    return out


def changed_since(sha: str, paths: set[str]) -> list[str]:
    if not sha:
        return sorted(paths)
    diff = git("diff", "--name-only", sha, "HEAD", "--", *sorted(paths))
    tracked = set(diff.splitlines())
    # uncommitted edits count as changed too
    tracked |= set(git("diff", "--name-only", "--", *sorted(paths)).splitlines())
    return sorted(tracked)


def main() -> int:
    snaps = round_snapshots()
    checked = last_round_checked()
    files = query_files()
    rows = []
    for name in files:
        rnd = checked.get(name)
        if rnd is None:
            rows.append((name, "never", "n/a", "NEVER-CHECKED"))
            continue
        sha = snaps.get(rnd, "")
        ch = changed_since(sha, files[name])
        status = "STALE" if ch else "current"
        rows.append((name, f"r{rnd:02d}", ",".join(ch) if ch else "-", status))

    if "--markdown" in sys.argv:
        print("| query | last driver round | changed since | status |")
        print("|---|---|---|---|")
        for r in rows:
            print(f"| `{r[0]}` | {r[1]} | {r[2]} | {r[3]} |")
    else:
        width = max(len(r[0]) for r in rows)
        for r in rows:
            print(f"{r[0]:<{width}}  {r[1]:>6}  {r[3]:<14} {r[2]}")
    n_stale = sum(1 for r in rows if r[3] == "STALE")
    n_never = sum(1 for r in rows if r[3] == "NEVER-CHECKED")
    print(f"\n{len(rows)} queries: {n_stale} stale, {n_never} never-checked "
          f"(stale/never rows need a driver-front slot or a local exact-mode run)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
