"""Shim: the training CLI lives in graspbalance_tpu.cli.train
(installed as the `gb-train` console script)."""

from graspbalance_tpu.cli.train import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
