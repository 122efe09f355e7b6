"""Shim: the AP-evaluation CLI lives in graspbalance_tpu.cli.eval_ap
(installed as the `gb-eval-ap` console script)."""

from graspbalance_tpu.cli.eval_ap import (  # noqa: F401
    _EVAL_METHOD,
    evaluate_dump,
    main,
    parse_args,
)

if __name__ == "__main__":
    main()
