"""Dataset cleaning / normalization utilities
(reference scripts/clean_charades.py, scripts/round_anet.py).

- ``clean_annotations``: keep [vid, duration, span, sentence] and append a
  running sample id; assert span end <= duration (clean_charades.py).
- ``round_durations``: round durations/spans to 2 decimals and clamp span
  ends to the duration (the round_anet.py normalization).

Usage:
    python -m vmrframe_tpu.tools.clean_data --mode clean --in A.json --out B.json
    python -m vmrframe_tpu.tools.clean_data --mode round --in A.json --out B.json
"""

from __future__ import annotations

import argparse
import json


def clean_annotations(records):
    out = []
    for sample_id, record in enumerate(records):
        vid, duration, span = record[0], record[1], record[2]
        assert duration >= span[1], f"{duration} {span[1]}"
        out.append(record[:4] + [sample_id])
    return out


def round_durations(records):
    out = []
    for record in records:
        vid, duration, (s, e), sentence = record[:4]
        duration = round(duration, 2)
        e = min(round(e, 2), duration)
        s = min(round(s, 2), e)
        out.append([vid, duration, [s, e], sentence] + list(record[4:]))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["clean", "round"], required=True)
    parser.add_argument("--in", dest="inp", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)
    with open(args.inp, encoding="utf8") as f:
        records = json.load(f)
    out = clean_annotations(records) if args.mode == "clean" else round_durations(records)
    with open(args.out, "w", encoding="utf8") as f:
        json.dump(out, f)
    print(f"{len(records)} -> {len(out)} records ({args.out})")


if __name__ == "__main__":
    main()
