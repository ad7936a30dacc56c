"""Scale-discipline lint: the anti-pattern rules the engine holds
itself to, enforced mechanically.

At 100 TB the failure modes are always the same five: a driver-side
collect of corpus-scale data, an un-broadcast cross join, a
row-at-a-time Python UDF, a drop to the RDD API, and a toPandas of a
distributed result. This lint greps the non-test source for each and
fails unless the site carries an explicit audit marker::

    .collect()  # scale-ok: k-row centroid read, k bounded by config

The marker may sit on the offending line or the line above. A marker
is a claim someone audited the site's cardinality — the lint makes
"unaudited scale hazard" a test failure instead of a review hope.
Run directly (exit 1 on findings) or via tests/test_scale_lint.py.
"""

from __future__ import annotations

import pathlib
import re
import sys

SRC = pathlib.Path(__file__).resolve().parent.parent / (
    "flights_data_pipeline_spark"
)

#: pattern -> what it risks at scale
RULES: dict[str, str] = {
    r"\.collect\(\)": "driver-side materialization",
    r"\.toPandas\(\)": "driver-side materialization (Arrow)",
    r"\.crossJoin\(": "cartesian product (must broadcast a bounded side)",
    r"\.toLocalIterator\(\)": "driver-side row pull",
    r"@udf\b|F\.udf\(": "row-at-a-time Python UDF (use pandas_udf)",
    r"\.rdd\b": "RDD drop-out (loses Catalyst/Tungsten)",
}

MARKER = "# scale-ok:"

#: a crossJoin whose argument is broadcast on the same line is the
#: sanctioned tiny-side idiom — no marker needed
_BROADCAST_XJOIN = re.compile(r"\.crossJoin\(\s*(F\.)?broadcast\(")


def findings() -> list[str]:
    out: list[str] = []
    for path in sorted(SRC.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            code = line.split("#", 1)[0]
            for pat, risk in RULES.items():
                if not re.search(pat, code):
                    continue
                if re.search(_BROADCAST_XJOIN, code):
                    continue
                here = MARKER in line
                above = i > 0 and MARKER in lines[i - 1]
                if not (here or above):
                    rel = path.relative_to(SRC.parent)
                    out.append(f"{rel}:{i + 1}: {risk}: {line.strip()}")
    return out


def main() -> int:
    found = findings()
    for f in found:
        print(f)
    if found:
        print(f"{len(found)} unaudited scale hazard(s)", file=sys.stderr)
        return 1
    print("scale-lint: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
