#!/usr/bin/env python3
"""Doc-number sweep (round-19 verdict ask #8): every measured number
README.md / SURVEY.md quote from a committed artifact is tagged with an
invisible anchor comment and verified against that artifact here, so a
narrative can never again quote a mid-round window the closing bench
contradicts (the round-19 salted-claim drift).

Anchor syntax in the markdown (invisible when rendered):

    337.7 s<!--#bench:value-->
    59x<!--#bench:scaling.adc[-1].routed_cand_rows/ratio-->

i.e. `NUMBER ... <!--#ARTIFACT:DOTTED.PATH[IDX]...-->` where ARTIFACT is
  bench    -> bench.json
  windows  -> ANN_WINDOWS.json
The doc number matches if rounding the artifact value to the doc
number's printed precision reproduces it exactly (docs quote rounded
values; artifacts hold full precision).

Usage: python3 tools/check_doc_numbers.py [--fix]   (from the repo root)
Exit 0 = every anchored number matches; 1 = drift (each named).
--fix rewrites each drifted doc number in place to the artifact value
rounded at the doc's printed precision (then re-run to confirm 0 drift).
"""
import json
import re
import sys
from pathlib import Path

ARTIFACTS = {
    "bench": "bench.json",
    "windows": "ANN_WINDOWS.json",
}

DOCS = ["README.md", "SURVEY.md"]

# NUMBER [unit chars] <!--#artifact:path-->  — the number is the LAST
# numeric token before the anchor (allows "82.0 vs 49.3 s<!--...-->"
# to anchor 49.3).
ANCHOR = re.compile(
    r"([0-9]+(?:\.[0-9]+)?)\s*[a-zA-Z%x×/]*\s*<!--#([a-z]+):([^>]+?)-->")


def resolve(obj, path):
    """Walk a dotted path with optional [idx] segments."""
    for part in re.findall(r"[^.\[\]]+|\[-?\d+\]", path):
        if part.startswith("["):
            obj = obj[int(part[1:-1])]
        else:
            obj = obj[part]
    return obj


def main():
    fix = "--fix" in sys.argv[1:]
    root = Path(__file__).resolve().parent.parent
    loaded = {}
    failures = []
    fixed = 0
    checked = 0
    for doc in DOCS:
        text = (root / doc).read_text()

        def repl(m):
            nonlocal checked, fixed
            quoted, art, path = m.group(1), m.group(2), m.group(3)
            checked += 1
            where = f"{doc}: {quoted} <!--#{art}:{path}-->"
            if art not in ARTIFACTS:
                failures.append(f"{where}: unknown artifact '{art}'")
                return m.group(0)
            if art not in loaded:
                p = root / ARTIFACTS[art]
                loaded[art] = json.loads(p.read_text()) if p.exists() else None
            if loaded[art] is None:
                failures.append(f"{where}: {ARTIFACTS[art]} missing")
                return m.group(0)
            try:
                actual = float(resolve(loaded[art], path.strip()))
            except (KeyError, IndexError, TypeError, ValueError) as e:
                failures.append(f"{where}: path failed to resolve ({e})")
                return m.group(0)
            decimals = len(quoted.split(".")[1]) if "." in quoted else 0
            if abs(round(actual, decimals) - float(quoted)) <= 1e-9:
                return m.group(0)
            if fix:
                new = (f"{round(actual, decimals):.{decimals}f}" if decimals
                       else str(int(round(actual))))
                fixed += 1
                print(f"FIXED {where} -> {new}")
                return m.group(0).replace(quoted, new, 1)
            failures.append(
                f"{where}: doc says {quoted}, artifact holds {actual}")
            return m.group(0)

        new_text = ANCHOR.sub(repl, text)
        if fix and new_text != text:
            (root / doc).write_text(new_text)
    for f in failures:
        print(f"DRIFT {f}")
    if fix:
        print(f"== rewrote {fixed} drifted numbers; "
              f"{checked - len(failures) - fixed}/{checked} already matched")
    else:
        print(f"== {checked - len(failures)}/{checked} anchored doc numbers "
              f"match the committed artifacts")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
