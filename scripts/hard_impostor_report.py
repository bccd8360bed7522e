"""Subset metrics from an evaluate-CLI scores.csv: sibling hard impostors.

Sibling fingers (data/generator.py sibling_fraction / the SyntheticV2
extension) share the canonical ridge field of a partner finger but carry an
independent pore layout — the hardest impostor pairs for pore verification.
This report restricts the impostor set to sibling↔partner pairs (keeping all
genuine pairs) and recomputes EER/AUC, plus the FAR of sibling pairs at the
full-set EER threshold.

Usage:
  python scripts/hard_impostor_report.py results/bc-v2-run3/scores.csv \
      --sibling-offset 200 --partner-base 100
(sibling person f{p+offset} rides the ridge field of partner f{p}; the
SyntheticV2 extension wrote siblings f0300..f0329 for partners f0100..f0129.)
"""
from __future__ import annotations

import argparse
import csv
import json
import re

import numpy as np


def person(img_id: str) -> str:
    stem = img_id.rsplit("/", 1)[-1]
    m = re.match(r"(.+?)_(\d+)_(\d+)$", stem)
    return m.group(1) if m else stem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scores_csv")
    ap.add_argument("--sibling-offset", type=int, default=200,
                    help="sibling fid = partner fid + offset (fallback when "
                         "no siblings.json)")
    ap.add_argument("--partner-base", type=int, default=100)
    ap.add_argument("--siblings-json", default="dataset/SyntheticV2/"
                    "siblings.json",
                    help="generator sidecar mapping sibling finger -> "
                         "partner finger; used instead of the offset "
                         "heuristic when it exists")
    args = ap.parse_args()

    if args.scores_csv.endswith(".gz"):
        import gzip
        fh = gzip.open(args.scores_csv, "rt")
    else:
        fh = open(args.scores_csv)
    rows = list(csv.DictReader(fh))
    labels = np.array([int(r["label"]) for r in rows])
    scores = np.array([float(r["score"]) for r in rows])

    def fid(p):
        m = re.search(r"f(\d+)$", p)
        return int(m.group(1)) if m else None

    import os
    pair_set = None
    if args.siblings_json and os.path.exists(args.siblings_json):
        mapping = json.load(open(args.siblings_json))

        def bare(p):
            return p.split("_", 1)[1] if "_" in p else p
        pair_set = {frozenset((s, t)) for s, t in mapping.items()}

    sib_mask = np.zeros(len(rows), bool)
    for i, r in enumerate(rows):
        if labels[i] == 1:
            continue
        pa, pb = person(r["id_a"]), person(r["id_b"])
        if pair_set is not None:
            if frozenset((bare(pa), bare(pb))) in pair_set:
                sib_mask[i] = True
            continue
        fa, fb = fid(pa), fid(pb)
        if fa is None or fb is None:
            continue
        lo, hi = min(fa, fb), max(fa, fb)
        if hi == lo + args.sibling_offset and lo >= args.partner_base:
            sib_mask[i] = True

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # runnable without an editable install
    from fpmatch_tpu.evaluation.metrics import verification_metrics

    full = verification_metrics(labels, scores)
    out = {"n_pairs": len(rows), "n_sibling_impostors": int(sib_mask.sum()),
           "full_eer": full["eer"], "full_threshold": full["threshold"]}
    if sib_mask.any():
        sel = (labels == 1) | sib_mask
        hard = verification_metrics(labels[sel], scores[sel])
        out["sibling_eer"] = hard["eer"]
        out["sibling_roc_auc"] = hard["roc_auc"]
        # sibling FAR at the full-set EER operating point
        out["sibling_far_at_full_threshold"] = float(
            (scores[sib_mask] >= full["threshold"]).mean())
    print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
