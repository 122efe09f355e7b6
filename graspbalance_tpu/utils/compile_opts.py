"""Per-jit TPU compiler options for the hot paths.

Round-5 XLA knob sweep (tools/bench_xla_flags.py, v5e 2026-08-21): raising
the scoped-VMEM fusion budget from the 16 MiB default moves the headline
eval forward 54.5 -> 51.7-51.9 ms (+5%), with a flat plateau across
32-48 MiB and a regression cliff at 64 MiB; 11 other fusion/dot/layout
options measured wash-to-negative (the full table is in the sweep log /
docs/NOTES.md). The options ride PJRT CompileOptions, the one channel
that reaches the remote compiler — client-side XLA_FLAGS do not.

Default: 40 MiB (mid-plateau, clear of the 64 MiB cliff) on TPU for the
EVAL forward paths; None elsewhere until measured. GB_SCOPED_VMEM_KIB
overrides ("" disables; any integer sets KiB).
"""

from __future__ import annotations

import os

_EVAL_DEFAULT_KIB = 40960


def tpu_compiler_options(kind: str = "eval") -> dict | None:
    """Options dict for jax.jit(compiler_options=...), or None off-TPU.

    kind='eval': the measured scoped-VMEM win applies (inference forward
    / decode / postprocess graphs). kind='train': returns None unless
    GB_SCOPED_VMEM_KIB is set — the train step's sweep measured the knob
    neutral there (see NOTES), so the parity default stays untouched.
    """
    import jax

    try:
        if jax.default_backend() != "tpu":
            return None
    except RuntimeError:  # backend init failure: let the caller's jit fail
        return None
    env = os.environ.get("GB_SCOPED_VMEM_KIB")
    if env is not None:
        return (
            {"xla_tpu_scoped_vmem_limit_kib": env} if env.strip() else None
        )
    if kind == "eval":
        return {"xla_tpu_scoped_vmem_limit_kib": str(_EVAL_DEFAULT_KIB)}
    return None
