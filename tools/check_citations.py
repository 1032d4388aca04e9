#!/usr/bin/env python3
"""Citation integrity gate (dev tool): every reference citation of the form
`<module>.py:N` or `<module>.py:N-M` appearing in src/ must point at a real
file under /root/reference with the cited line range inside the file. Keeps
the file:line discipline honest — a citation that outlives a refactor (or
never existed) fails the gate.

Usage: python3 tools/check_citations.py  (exit 0 iff all citations resolve)
"""
import re, sys
from pathlib import Path

REF = Path("/root/reference")
SRC = Path("/root/repo/src")

# module name -> real path under the reference checkout
FILES = {
    "connections.py": REF / "pyopenetl" / "connections.py",
    "operations.py": REF / "pyopenetl" / "operations.py",
    "pipelines.py": REF / "pyopenetl" / "pipelines.py",
    "setup.py": REF / "setup.py",
    "__init__.py": REF / "pyopenetl" / "__init__.py",
}
LINES = {m: sum(1 for _ in p.open()) for m, p in FILES.items()}

CITE = re.compile(
    r"(?:pyopenetl/)?(connections|operations|pipelines|setup|__init__)\.py"
    r":(\d+(?:-\d+)?(?:\s*,\s*\d+(?:-\d+)?)*)")


def main():
    bad = []
    n_cites = 0
    for f in sorted(SRC.rglob("*.scala")):
        for ln_no, line in enumerate(f.read_text().splitlines(), 1):
            for m in CITE.finditer(line):
                mod = m.group(1) + ".py"
                for span in re.split(r"\s*,\s*", m.group(2)):
                    n_cites += 1
                    parts = span.split("-")
                    lo = int(parts[0])
                    hi = int(parts[1]) if len(parts) > 1 else lo
                    total = LINES[mod]
                    if lo < 1 or hi < lo or hi > total:
                        bad.append(
                            f"{f.relative_to(SRC.parent)}:{ln_no}: "
                            f"{mod}:{span} out of range (file has "
                            f"{total} lines)")
    for b in bad:
        print("DANGLING", b)
    print(f"{n_cites - len(bad)}/{n_cites} reference citations resolve")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
