"""Checked-in model assets.

TINY_BERT_NER: HF-layout token-classification checkpoint (config.json,
vocab.txt, pytorch_model.bin) with a trained ``classifier.*`` head —
built by scripts/train_tiny_checkpoint.py, loaded torch-lessly by
state/numpy_bert.py.  The flagship transformer-path tests and bench use
it; swap any real TinyBERN-style checkpoint dir in its place on a
cluster."""

import os

TINY_BERT_NER = os.path.join(os.path.dirname(__file__), "tiny_bert_ner")
