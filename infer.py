"""Shim: the inference CLI lives in graspbalance_tpu.cli.infer
(installed as the `gb-infer` console script)."""

from graspbalance_tpu.cli.infer import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
