"""Shim: the DSN segmentation training CLI lives in
graspbalance_tpu.cli.train_seg (installed as the `gb-train-seg` console
script)."""

from graspbalance_tpu.cli.train_seg import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
