"""Lightweight line coverage for the package via sys.monitoring (3.12+).

No external coverage dependency exists in this container; this pytest
plugin uses PEP 669 monitoring with first-hit disarming (each (code,
line) location reports once, then disables), so suite overhead is
negligible.  Produces ``/tmp/pcheb_cov.json``: per-file executable and
missed line numbers for every module under ``pychebyshev_tpu/``.

Usage:
    python -m pytest tests/ -q -p scripts.line_coverage
    python scripts/line_coverage.py report          # prints the gaps
"""

from __future__ import annotations

import json
import os
import sys

_PKG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "pychebyshev_tpu")
_OUT = "/tmp/pcheb_cov.json"
_TOOL = 2  # sys.monitoring.COVERAGE_ID
_seen: dict[str, set[int]] = {}


def _on_line(code, line):
    fname = code.co_filename
    if fname.startswith(_PKG):
        _seen.setdefault(fname, set()).add(line)
    return sys.monitoring.DISABLE


def pytest_configure(config):
    mon = sys.monitoring
    mon.use_tool_id(_TOOL, "pcheb-line-cov")
    mon.register_callback(_TOOL, mon.events.LINE, _on_line)
    mon.set_events(_TOOL, mon.events.LINE)


def pytest_unconfigure(config):
    mon = sys.monitoring
    mon.set_events(_TOOL, 0)
    mon.free_tool_id(_TOOL)
    json.dump({f: sorted(lines) for f, lines in _seen.items()},
              open(_OUT, "w"))
    sys.stderr.write(f"[line-cov] wrote {_OUT} "
                     f"({len(_seen)} files)\n")


def _executable_lines(path: str) -> set[int]:
    """All line numbers the compiler places code on (docstring constants
    excluded by construction: they appear only as co_consts)."""
    src = open(path, encoding="utf-8").read()
    lines: set[int] = set()
    stack = [compile(src, path, "exec")]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def report(min_missed: int = 1) -> None:
    seen = {f: set(v) for f, v in json.load(open(_OUT)).items()}
    rows = []
    for root, _dirs, files in os.walk(_PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            possible = _executable_lines(path)
            hit = seen.get(path, set()) & possible
            missed = sorted(possible - hit)
            if len(missed) >= min_missed:
                rows.append((len(missed), len(possible),
                             os.path.relpath(path, _PKG), missed))
    rows.sort(reverse=True)
    total_missed = sum(r[0] for r in rows)
    total_lines = sum(r[1] for r in rows)
    print(f"missed {total_missed} / {total_lines} executable lines")
    for n_missed, n_all, rel, missed in rows:
        pct = 100.0 * (1 - n_missed / n_all)
        print(f"\n{rel}: {pct:.1f}% ({n_missed} missed)")
        # compress runs
        runs, start, prev = [], missed[0], missed[0]
        for ln in missed[1:]:
            if ln == prev + 1:
                prev = ln
                continue
            runs.append((start, prev))
            start = prev = ln
        runs.append((start, prev))
        print("  " + ", ".join(
            f"{a}" if a == b else f"{a}-{b}" for a, b in runs))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report(int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    else:
        print(__doc__)
