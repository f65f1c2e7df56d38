#!/usr/bin/env python3
"""Differential-test harness: evaluate the REFERENCE's own filter algebra
(memo_cli.py matches_filter / eval_condition) over generated cases.

The reference imports faiss at module scope (its ANN index), but the filter
functions are pure Python, so faiss is stubbed with an empty module before
the import -- nothing index-related runs here.

Protocol (stdin -> stdout, one shot):
  input : one JSON object {"metas": [...], "filters": [...]}
  output: one line per filter, a '1'/'0' char per meta, where 1 means the
          reference matches that (meta, filter) pair -- including its
          no-metadata gate (memo_cli.py:503,671: empty metadata never
          reaches matches_filter).
Usage: python3 ref_filter_harness.py /path/to/memo_cli.py
"""
import importlib.util
import json
import sys
import types


def load_reference(path: str):
    sys.modules.setdefault("faiss", types.ModuleType("faiss"))
    spec = importlib.util.spec_from_file_location("memo_cli", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["memo_cli"] = mod  # dataclass processing needs the entry
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    mod = load_reference(sys.argv[1])
    cases = json.load(sys.stdin)
    metas, filters = cases["metas"], cases["filters"]
    out = []
    for filt in filters:
        out.append("".join(
            "1" if (bool(meta) and mod.matches_filter(meta, filt)) else "0"
            for meta in metas))
    print("\n".join(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
