"""Capture REAL tree-sitter grammar-path goldens (VERDICT r04 #2).

This sandbox ships no tree-sitter wheels (and installs are not
permitted), so the grammar path's only executable pin here is the
clean-room test double (tests/fake_tree_sitter.py). Run this tool ONCE
in any environment with real wheels::

    pip install tree-sitter tree-sitter-python tree-sitter-rust ...
    python tools/record_ts_goldens.py

It drives operators/chunker_ts.extract_objects_ts over every language
fixture in tests/ts_fixture_sources.py for which a real grammar loads,
and writes the full object lists (names, kinds, rows/cols, byte spans,
context lines) to tests/goldens_ts/<key>.json with runtime-version
metadata. Check the JSON files in: tests/test_chunker_ts.py's
test_recorded_real_goldens then pins the grammar path against the
recorded REAL output on every subsequent run, wheels or not (for
python fixtures the ast-backed fake runtime replays them; other
languages re-verify whenever wheels are present).

Exit status: 0 if at least one golden was recorded, 2 if no grammar
loaded (wrong environment).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from codebased_spark.operators.chunker import HAVE_TREE_SITTER  # noqa: E402
from codebased_spark.operators.chunker_ts import (  # noqa: E402
    extract_objects_ts,
    have_grammar,
)
from tests.ts_fixture_sources import FIXTURES, obj_record  # noqa: E402


def main() -> int:
    if not HAVE_TREE_SITTER:
        print("tree_sitter is not importable — run this in a "
              "wheel-bearing environment", file=sys.stderr)
        return 2
    try:
        import tree_sitter

        ts_version = getattr(tree_sitter, "__version__", "unknown")
    except Exception:
        ts_version = "unknown"

    out_dir = os.path.join(REPO, "tests", "goldens_ts")
    os.makedirs(out_dir, exist_ok=True)
    recorded = skipped = 0
    for key, (path, lang, src) in sorted(FIXTURES.items()):
        if not have_grammar(lang):
            print(f"skip {key}: no {lang} grammar wheel")
            skipped += 1
            continue
        objs = extract_objects_ts(lang, src)
        if objs is None:
            print(f"skip {key}: grammar load failed for {lang}")
            skipped += 1
            continue
        rec = {
            "fixture": key,
            "path": path,
            "lang": lang,
            "tree_sitter_version": ts_version,
            "objects": [obj_record(o) for o in objs],
        }
        with open(os.path.join(out_dir, f"{key}.json"), "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"recorded {key}: {len(rec['objects'])} objects ({lang})")
        recorded += 1
    print(f"{recorded} recorded, {skipped} skipped -> {out_dir}")
    return 0 if recorded else 2


if __name__ == "__main__":
    sys.exit(main())
