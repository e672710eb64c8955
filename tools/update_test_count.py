"""Patch COVERAGE.md's pytest count from the committed pytest artifact
(VERDICT r9 what's-wrong #2: hand-copied counts drifted twice — r8
659-vs-661, r9 678-vs-679). Run after the full suite:

    python -m pytest tests/ -q | tee PYTEST_LAST.txt
    python tools/update_test_count.py [PYTEST_LAST.txt]

Parses the final summary line and rewrites the `pytest **N passed**`
token in COVERAGE.md, so the doc number IS the CI output."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    art = Path(sys.argv[1] if len(sys.argv) > 1 else REPO / "PYTEST_LAST.txt")
    text = art.read_text()
    m = None
    for m in re.finditer(r"(\d+) passed(?:, (\d+) skipped)?", text):
        pass
    if m is None:
        print(f"no pytest summary line in {art}", file=sys.stderr)
        return 1
    passed, skipped = int(m.group(1)), int(m.group(2) or 0)
    cov = REPO / "COVERAGE.md"
    body = cov.read_text()
    new, n = re.subn(
        r"pytest \*\*\d+ passed\*\* \+ \d+",
        f"pytest **{passed} passed** + {skipped}",
        body,
    )
    if n == 0:
        print("COVERAGE.md pattern not found", file=sys.stderr)
        return 1
    cov.write_text(new)
    print(f"COVERAGE.md: pytest count -> {passed} passed + {skipped} skipped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
