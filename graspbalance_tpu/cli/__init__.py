"""Command-line drivers (pip console scripts gb-train / gb-train-seg /
gb-infer / gb-eval-ap; the repo-root train.py etc. are thin shims onto
these so `python train.py ...` keeps working from a checkout)."""
