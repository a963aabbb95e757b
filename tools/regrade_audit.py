"""Stale-grade audit: which operators changed AFTER their last driver grade?

The grading driver samples a 50-key window per round, so every key's
most recent `CORRECTNESS_r*.json` grade is authoritative — UNTIL the
builder re-plans the op. Round 12 hit exactly this: the three SCALE
§34 dedup re-plans landed after their r1/r3/r5 grades, and coverage
had to be patched by ad-hoc re-drives. This tool makes the rule
mechanical (VERDICT r12 item 4):

  Any op whose implementation changes after its last driver grade must
  get a same-round strict sf0.1 re-drive, recorded in BASELINE.md and
  in REGRADES.json.

Method: for each registered key, find its spark_fn's defining file +
function name via the live registry at HEAD, extract the function's
source segment (decorators included — the oracle SQL lives in the
decorator call) at HEAD and at the round-boundary commit of the key's
latest driver grade ("round N: verdict/advice/correctness/bench" —
that commit only adds grading artifacts, so its source tree is the
graded tree), and compare hashes. A key whose hashes differ is STALE
unless REGRADES.json records a builder re-drive at a commit whose
function source matches HEAD.

Known boundary (declared, not hidden): the hash covers the decorated
function's own source. A behavior change routed purely through a
shared helper or a module-level constant the function references is
not caught — the full-surface sf0.1 strict sweep each round remains
the backstop for that class.

REGRADES.json format (repo root):
  {"_full_surface_verifications": [{"commit": sha, "date", "note"}],
   "<key>": {"commit": sha, "date", "sf", "result", "note"}}
A full-surface entry credits EVERY key whose HEAD source matches that
commit's (the per-round strict sf0.1 sweeps verify all 597, so a key
unchanged since the last sweep tree is not stale no matter how old its
driver grade is); per-key entries credit individual builder re-drives.

Usage:  python tools/regrade_audit.py
Output: one JSON line {checked, stale:[{key,...}], uncovered_new,
        covered_by_regrade, covered_by_sweep (count), errors, head}.
        Exit 1 if any key is stale OR is a never-driver-graded key with
        no sweep/REGRADES coverage of its HEAD source (uncovered_new —
        ADVICE r13: new operators get no free pass).
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def round_boundary_commits() -> dict[int, str]:
    out = git(
        "log",
        "--format=%H %s",
        "--grep=verdict/advice/correctness/bench",
    )
    bounds: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+):", subject)
        if m:
            bounds[int(m.group(1))] = sha
    return bounds


def latest_grade_round() -> dict[str, int]:
    """key -> highest round N whose CORRECTNESS_rN.json graded it."""
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fn)
        if not m:
            continue
        n = int(m.group(1))
        with open(os.path.join(REPO, fn)) as f:
            graded = json.load(f)
        for key in graded:
            latest[key] = max(latest.get(key, 0), n)
    return latest


_file_cache: dict[tuple[str, str], str | None] = {}


def file_at(commit: str, relpath: str) -> str | None:
    k = (commit, relpath)
    if k not in _file_cache:
        try:
            _file_cache[k] = git("show", f"{commit}:{relpath}")
        except subprocess.CalledProcessError:
            _file_cache[k] = None  # file did not exist at that commit
    return _file_cache[k]


def func_hash(source: str, func_name: str) -> str | None:
    """Hash of every def named ``func_name`` (decorators included)."""
    try:
        tree = ast.parse(source)
    except SyntaxError:
        return None
    lines = source.splitlines()
    segs = []
    for node in ast.walk(tree):
        if (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name == func_name
        ):
            start = min(
                [node.lineno] + [d.lineno for d in node.decorator_list]
            )
            segs.append("\n".join(lines[start - 1 : node.end_lineno]))
    if not segs:
        return None
    blob = "\n\x00\n".join(sorted(segs))
    return hashlib.sha256(blob.encode()).hexdigest()


def main() -> None:
    from etl_intraday_bidask_spark.registry import load_all_operators

    registry = load_all_operators()
    bounds = round_boundary_commits()
    latest = latest_grade_round()
    head = git("rev-parse", "HEAD").strip()
    regrades_path = os.path.join(REPO, "REGRADES.json")
    regrades: dict[str, dict] = {}
    if os.path.exists(regrades_path):
        with open(regrades_path) as f:
            regrades = json.load(f)

    sweeps = [
        s["commit"]
        for s in regrades.get("_full_surface_verifications", [])
        if s.get("commit")
    ]

    stale, covered, errors, never_graded = [], [], [], []
    uncovered_new: list[dict] = []
    covered_by_sweep = 0
    for key, spec in sorted(registry.items()):
        fn = spec.spark_fn
        relpath = os.path.relpath(fn.__code__.co_filename, REPO)
        func_name = fn.__name__
        n = latest.get(key)
        if n is None:
            # ADVICE r13: a never-graded key must NOT pass the audit
            # silently — it still needs sweep or REGRADES coverage of
            # its CURRENT source, else it lands in uncovered_new and the
            # exit code goes nonzero (the mechanical rule has no
            # new-operator loophole).
            try:
                with open(os.path.join(REPO, relpath)) as f:
                    head_src = f.read()
            except OSError:
                head_src = None
            h_now = func_hash(head_src, func_name) if head_src else None
            entry = {"key": key, "file": relpath, "func": func_name}
            if h_now is None:
                errors.append(
                    {"key": key, "err": f"cannot hash {func_name} at HEAD"}
                )
                continue
            swept = any(
                (sw := file_at(c, relpath)) and func_hash(sw, func_name) == h_now
                for c in sweeps
            )
            rg = regrades.get(key)
            rg_ok = False
            if rg and rg.get("commit"):
                rg_src = file_at(rg["commit"], relpath)
                rg_ok = bool(rg_src) and func_hash(rg_src, func_name) == h_now
            if swept:
                covered_by_sweep += 1
                never_graded.append(key)
            elif rg_ok:
                covered.append({**entry, "regrade": rg, "never_graded": True})
                never_graded.append(key)
            else:
                uncovered_new.append(entry)
            continue
        if n not in bounds:
            errors.append({"key": key, "err": f"no boundary commit for r{n}"})
            continue
        # Hash the WORKING TREE, not the HEAD commit — the audit must see
        # uncommitted re-plans (that is its whole point mid-round).
        try:
            with open(os.path.join(REPO, relpath)) as f:
                head_src = f.read()
        except OSError:
            head_src = None
        h_now = func_hash(head_src, func_name) if head_src else None
        if h_now is None:
            errors.append(
                {"key": key, "err": f"cannot hash {func_name} at HEAD"}
            )
            continue
        graded_src = file_at(bounds[n], relpath)
        h_then = func_hash(graded_src, func_name) if graded_src else None
        if h_then == h_now:
            continue
        # Full-surface sweep credit: verified at a sweep tree whose
        # function source matches HEAD.
        swept = False
        for sweep_commit in sweeps:
            sw_src = file_at(sweep_commit, relpath)
            if sw_src and func_hash(sw_src, func_name) == h_now:
                swept = True
                break
        if swept:
            covered_by_sweep += 1
            continue
        row = {
            "key": key,
            "file": relpath,
            "func": func_name,
            "last_grade_round": n,
            "reason": (
                "file absent at graded tree"
                if graded_src is None
                else (
                    "function absent at graded tree"
                    if h_then is None
                    else "function source changed since last driver grade"
                )
            ),
        }
        rg = regrades.get(key)
        if rg and rg.get("commit"):
            rg_src = file_at(rg["commit"], relpath)
            h_rg = func_hash(rg_src, func_name) if rg_src else None
            if h_rg == h_now:
                covered.append({**row, "regrade": rg})
                continue
            row["reason"] += "; REGRADES entry predates a further change"
        stale.append(row)

    out = {
        "checked": len(registry),
        "never_graded": never_graded,
        "uncovered_new": uncovered_new,
        "stale": stale,
        "covered_by_regrade": covered,
        "covered_by_sweep": covered_by_sweep,
        "errors": errors,
        "head": head,
    }
    print(json.dumps(out))
    sys.exit(1 if (stale or uncovered_new) else 0)


if __name__ == "__main__":
    main()
