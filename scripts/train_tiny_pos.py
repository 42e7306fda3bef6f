"""Train + ship the repo's tiny averaged-perceptron POS tagger.

Produces ``kazu_ray/assets/tiny_pos.json`` — learned feature weights
for the 11-tag tagger behind the conjunction chunker
(kazu_ray/functions/pos_chunker.py).  Same playbook as the Punkt
sentencizer and the tiny BERT checkpoints: learned from scratch by a
shipped deterministic script, asset checked in, fixture-gated in
pytest (tests/test_pos_chunker.py holds a held-out dev set the trainer
never sees).

The model is the classic averaged perceptron tagger (Collins 2002;
the public single-pass formulation popularized by Honnibal's
"A Good POS Tagger in about 200 Lines of Python"): greedy left-to-right
decoding, features over the word form, prefixes/suffixes, and the two
previous predicted tags, with averaged weights.

Deterministic: seeded shuffle, fixed iteration count — re-running
reproduces the same bytes.  Run from the repo root:

    python scripts/train_tiny_pos.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kazu_ray.functions.pos_chunker import TAGSET, features  # noqa: E402

OUT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "kazu_ray", "assets", "tiny_pos.json"
)
SEED = 20260819
ITERATIONS = 12

# ---------------------------------------------------------------------------
# training corpus: word/TAG pairs.  Biomedical noun phrases (the
# conjunction-split domain) + general English so verbs/adverbs/preps
# are learnable.  Tagset: NOUN ADJ DET CC ADP NUM VERB ADV PRON PUNCT X
# ---------------------------------------------------------------------------
TAGGED = [
    "the/DET patient/NOUN presented/VERB with/ADP melanoma/NOUN of/ADP the/DET skin/NOUN ./PUNCT",
    "skin/NOUN ,/PUNCT lung/NOUN and/CC breast/NOUN cancer/NOUN were/VERB studied/VERB ./PUNCT",
    "acute/ADJ and/CC chronic/ADJ myeloid/ADJ leukemia/NOUN respond/VERB differently/ADV ./PUNCT",
    "triple/ADJ negative/ADJ ductal/ADJ carcinoma/NOUN is/VERB aggressive/ADJ ./PUNCT",
    "gastric/ADJ and/CC renal/ADJ tumors/NOUN recurred/VERB early/ADV ./PUNCT",
    "two/NUM large/ADJ hepatic/ADJ lesions/NOUN were/VERB resected/VERB ./PUNCT",
    "cancer/NOUN of/ADP the/DET lung/NOUN and/CC liver/NOUN spreads/VERB fast/ADV ./PUNCT",
    "she/PRON took/VERB aspirin/NOUN or/CC paracetamol/NOUN daily/ADV ./PUNCT",
    "he/PRON was/VERB diagnosed/VERB and/CC treated/VERB promptly/ADV ./PUNCT",
    "slow/ADJ and/CC steady/ADJ progress/NOUN wins/VERB the/DET race/NOUN ./PUNCT",
    "mutations/NOUN in/ADP the/DET gene/NOUN drive/VERB resistance/NOUN ./PUNCT",
    "ovarian/ADJ cysts/NOUN and/CC fibroids/NOUN are/VERB common/ADJ ./PUNCT",
    "severe/ADJ asthma/NOUN improved/VERB with/ADP inhaled/ADJ steroids/NOUN ./PUNCT",
    "the/DET biopsy/NOUN of/ADP the/DET liver/NOUN was/VERB scheduled/VERB ./PUNCT",
    "patients/NOUN with/ADP diabetes/NOUN and/CC hypertension/NOUN enrolled/VERB ./PUNCT",
    "nephropathy/NOUN ,/PUNCT retinopathy/NOUN and/CC neuropathy/NOUN worsen/VERB slowly/ADV ./PUNCT",
    "a/DET malignant/ADJ melanoma/NOUN metastasized/VERB to/ADP the/DET brain/NOUN ./PUNCT",
    "three/NUM cycles/NOUN of/ADP chemotherapy/NOUN and/CC radiation/NOUN followed/VERB ./PUNCT",
    "renal/ADJ failure/NOUN is/VERB acute/ADJ or/CC chronic/ADJ ./PUNCT",
    "the/DET squamous/ADJ cell/NOUN carcinoma/NOUN invaded/VERB nearby/ADJ tissue/NOUN ./PUNCT",
    "neither/DET fever/NOUN nor/CC rash/NOUN appeared/VERB ./PUNCT",
    "hepatitis/NOUN and/CC cirrhosis/NOUN damage/VERB the/DET liver/NOUN badly/ADV ./PUNCT",
    "early/ADJ detection/NOUN saves/VERB lives/NOUN ./PUNCT",
    "the/DET tumor/NOUN shrank/VERB after/ADP treatment/NOUN ./PUNCT",
    "primary/ADJ and/CC secondary/ADJ endpoints/NOUN were/VERB met/VERB ./PUNCT",
    "fibrosis/NOUN of/ADP the/DET lung/NOUN progresses/VERB ./PUNCT",
    "colitis/NOUN ,/PUNCT gastritis/NOUN and/CC dermatitis/NOUN share/VERB pathways/NOUN ./PUNCT",
    "leukocytes/NOUN and/CC erythrocytes/NOUN circulate/VERB ./PUNCT",
    "an/DET invasive/ADJ ductal/ADJ carcinoma/NOUN of/ADP the/DET breast/NOUN ./PUNCT",
    "sarcoma/NOUN ,/PUNCT lymphoma/NOUN or/CC myeloma/NOUN may/VERB recur/VERB ./PUNCT",
    "anemia/NOUN and/CC leukemia/NOUN affect/VERB blood/NOUN ./PUNCT",
    "stenosis/NOUN or/CC thrombosis/NOUN blocks/VERB arteries/NOUN ./PUNCT",
    "pulmonary/ADJ and/CC cardiac/ADJ function/NOUN declined/VERB ./PUNCT",
    "the/DET five/NUM largest/ADJ nodules/NOUN calcified/VERB ./PUNCT",
    "biopsies/NOUN confirmed/VERB adenoma/NOUN and/CC polyps/NOUN ./PUNCT",
    "he/PRON runs/VERB quickly/ADV and/CC carefully/ADV ./PUNCT",
    "it/PRON is/VERB very/ADV effective/ADJ against/ADP pain/NOUN ./PUNCT",
    "screening/NOUN found/VERB cancers/NOUN in/ADP ten/NUM patients/NOUN ./PUNCT",
    "metformin/NOUN controls/VERB glucose/NOUN levels/NOUN ./PUNCT",
    "imatinib/NOUN and/CC nilotinib/NOUN inhibit/VERB kinases/NOUN ./PUNCT",
    "cells/NOUN undergo/VERB apoptosis/NOUN under/ADP stress/NOUN ./PUNCT",
    "hepatocytes/NOUN secrete/VERB albumin/NOUN into/ADP plasma/NOUN ./PUNCT",
    "this/DET benign/ADJ cyst/NOUN needs/VERB no/DET surgery/NOUN ./PUNCT",
    "carcinoma/NOUN of/ADP the/DET skin/NOUN ,/PUNCT lung/NOUN and/CC breast/NOUN ./PUNCT",
    "gastric/ADJ ulcers/NOUN bleed/VERB or/CC perforate/VERB ./PUNCT",
    "bone/NOUN marrow/NOUN produces/VERB platelets/NOUN ./PUNCT",
    "seven/NUM lesions/NOUN regressed/VERB spontaneously/ADV ./PUNCT",
    "chemotherapy/NOUN is/VERB toxic/ADJ but/CC effective/ADJ ./PUNCT",
    "the/DET trial/NOUN enrolled/VERB forty/NUM volunteers/NOUN ./PUNCT",
    "cirrhotic/ADJ livers/NOUN regenerate/VERB poorly/ADV ./PUNCT",
    "results/NOUN vary/VERB widely/ADV ./PUNCT",
    "six/NUM distinct/ADJ subtypes/NOUN exist/VERB ./PUNCT",
    "the/DET outcome/NOUN is/VERB poor/ADJ ./PUNCT",
    "relapses/NOUN occur/VERB often/ADV ./PUNCT",
    "nine/NUM fresh/ADJ samples/NOUN arrived/VERB ./PUNCT",
    "the/DET prognosis/NOUN is/VERB grim/ADJ ./PUNCT",
    # noun-phrase FRAGMENTS: the conjunction splitter's actual input
    # distribution is entity matches (no verb), so the tagger must not
    # hallucinate a predicate after a noun sequence
    "skin/NOUN and/CC lung/NOUN disease/NOUN",
    "breast/NOUN cancer/NOUN patients/NOUN",
    "squamous/ADJ cell/NOUN carcinoma/NOUN of/ADP the/DET lung/NOUN",
    "acute/ADJ renal/ADJ failure/NOUN",
    "bone/NOUN and/CC soft/ADJ tissue/NOUN sarcoma/NOUN",
    "type/NOUN two/NUM diabetes/NOUN mellitus/NOUN",
    "head/NOUN and/CC neck/NOUN cancer/NOUN",
    "small/ADJ cell/NOUN lung/NOUN carcinoma/NOUN",
    "liver/NOUN and/CC kidney/NOUN toxicity/NOUN",
    "stage/NOUN three/NUM gastric/ADJ adenocarcinoma/NOUN",
    "heart/NOUN ,/PUNCT lung/NOUN and/CC kidney/NOUN transplantation/NOUN",
    "benign/ADJ prostate/NOUN hyperplasia/NOUN",
    "upper/ADJ airway/NOUN inflammation/NOUN",
    "colon/NOUN ,/PUNCT rectum/NOUN or/CC stomach/NOUN polyps/NOUN",
    "chronic/ADJ obstructive/ADJ pulmonary/ADJ syndrome/NOUN",
]


def parse(line: str) -> tuple[list[str], list[str]]:
    words, tags = [], []
    for tok in line.split():
        w, t = tok.rsplit("/", 1)
        assert t in TAGSET, t
        words.append(w)
        tags.append(t)
    return words, tags


def main() -> None:
    data = [parse(s) for s in TAGGED]
    rng = np.random.default_rng(SEED)
    weights: dict[str, dict[str, float]] = {}
    totals: dict[tuple[str, str], float] = {}
    stamps: dict[tuple[str, str], int] = {}
    step = 0

    def predict(feats) -> str:
        scores = dict.fromkeys(TAGSET, 0.0)
        for f in feats:
            fw = weights.get(f)
            if fw:
                for t, w in fw.items():
                    scores[t] += w
        return max(TAGSET, key=lambda t: (scores[t], t))

    def upd(f: str, t: str, delta: float):
        key = (f, t)
        totals[key] = totals.get(key, 0.0) + (step - stamps.get(key, 0)) * weights.get(
            f, {}
        ).get(t, 0.0)
        stamps[key] = step
        weights.setdefault(f, {})[t] = weights.get(f, {}).get(t, 0.0) + delta

    order = np.arange(len(data))
    for _ in range(ITERATIONS):
        rng.shuffle(order)
        for idx in order:
            words, gold = data[idx]
            p2 = p1 = "-START-"
            for i, (w, g) in enumerate(zip(words, gold)):
                step += 1
                feats = features(words, i, p1, p2)
                guess = predict(feats)
                if guess != g:
                    for f in feats:
                        upd(f, g, 1.0)
                        upd(f, guess, -1.0)
                p2, p1 = p1, guess
    # average
    for (f, t), tot in totals.items():
        w = weights.get(f, {}).get(t, 0.0)
        avg = (tot + (step - stamps[(f, t)]) * w) / step
        if abs(avg) > 1e-9:
            weights[f][t] = round(avg, 6)
        elif t in weights.get(f, {}):
            del weights[f][t]
    weights = {f: tw for f, tw in weights.items() if tw}

    # train accuracy with the averaged weights
    right = total = 0
    for words, gold in data:
        p2 = p1 = "-START-"
        for i, g in enumerate(gold):
            guess = predict(features(words, i, p1, p2))
            right += guess == g
            total += 1
            p2, p1 = p1, guess
    acc = right / total
    print(f"train accuracy: {acc:.4f} ({right}/{total}) features={len(weights)}")
    if acc < 0.995:
        raise SystemExit("tagger did not fit the training corpus; add capacity")

    # unambiguous-word lexicon (perceptron weights only exist for words
    # that ever caused an error; the lexicon covers the rest)
    seen: dict[str, set[str]] = {}
    for words, gold in data:
        for w, g in zip(words, gold):
            seen.setdefault(w.lower(), set()).add(g)
    lexicon = {w: next(iter(ts)) for w, ts in seen.items() if len(ts) == 1}

    out = os.path.abspath(OUT_PATH)
    with open(out, "w") as fh:
        json.dump(
            {"weights": weights, "lexicon": lexicon},
            fh,
            sort_keys=True,
            separators=(",", ":"),
        )
    print(
        f"weights written to {out} ({os.path.getsize(out)/1024:.0f} KiB, "
        f"lexicon {len(lexicon)} words)"
    )


if __name__ == "__main__":
    main()
