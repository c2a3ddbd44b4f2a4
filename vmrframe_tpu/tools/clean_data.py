"""Dataset cleaning / normalization utilities
(reference scripts/clean_charades.py, scripts/round_anet.py).

- ``clean_annotations``: keep [vid, duration, span, sentence] and append a
  running sample id; assert span end <= duration (clean_charades.py).
- ``round_durations``: round durations/spans to 2 decimals and clamp span
  ends to the duration (the round_anet.py normalization).

- ``--mode prepare-ban``: one-command dataset prep for the BAN config, which
  points at ``data/charades_clean/{train,test}.json``
  (reference config/charades/BAN.json:10-11) that the reference never ships —
  cleans both splits of a charades annotation dir into the clean layout.

Usage:
    python -m vmrframe_tpu.tools.clean_data --mode clean --in A.json --out B.json
    python -m vmrframe_tpu.tools.clean_data --mode round --in A.json --out B.json
    python -m vmrframe_tpu.tools.clean_data --mode prepare-ban \
        --in /root/reference/data/charades_gt --out data/charades_clean
"""

from __future__ import annotations

import argparse
import json
import os


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


def prepare_ban(src_dir: str, out_dir: str):
    """Clean train.json + test.json from ``src_dir`` into ``out_dir`` —
    produces the ``charades_clean`` layout BAN's config expects."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for split in ("train", "test"):
        src = os.path.join(src_dir, f"{split}.json")
        dst = os.path.join(out_dir, f"{split}.json")
        with open(src, encoding="utf8") as f:
            records = json.load(f)
        cleaned = clean_annotations(records)
        with open(dst, "w", encoding="utf8") as f:
            json.dump(cleaned, f)
        written.append((dst, len(cleaned)))
        print(f"{split}: {len(records)} -> {len(cleaned)} records ({dst})")
    return written


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["clean", "round", "prepare-ban"], required=True)
    parser.add_argument("--in", dest="inp", required=True,
                        help="input json (clean/round) or annotation dir (prepare-ban)")
    parser.add_argument("--out", required=True,
                        help="output json (clean/round) or output dir (prepare-ban)")
    args = parser.parse_args(argv)
    if args.mode == "prepare-ban":
        prepare_ban(args.inp, args.out)
        return
    with open(args.inp, encoding="utf8") as f:
        records = json.load(f)
    out = clean_annotations(records) if args.mode == "clean" else round_durations(records)
    with open(args.out, "w", encoding="utf8") as f:
        json.dump(out, f)
    print(f"{len(records)} -> {len(out)} records ({args.out})")


if __name__ == "__main__":
    main()
