"""Roofline / MFU accounting for benchmark output (VERDICT r3 #4).

Pulls FLOP and HBM-byte counts from XLA's compiled cost analysis (structural
counts, not the estimated_cycles time model — the latter is known-unreliable
for copies/reduces, docs/NOTES.md round 3) and converts a measured wall time
into achieved TF/s, GB/s, and % of the chip rooflines, so every "fast"
claim in BENCH_r0N / run_all output is auditable without NOTES archaeology.

TPU v5e (1 chip) peaks, from the public spec: 197 TFLOP/s bf16, 393.5
TOP/s int8, 819 GB/s HBM BW. f32 has no native MXU path; the effective
f32 peak is bf16/4 (6-pass emulation with f32 accumulate) = 49.2 TF/s —
the same convention VERDICT r3 used ("~27 TF/s = ~55% of f32-effective").
"""

from __future__ import annotations

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_F32_TFLOPS = 49.2
V5E_HBM_GBS = 819.0


def xla_cost(jitted_fn, *args, **kwargs) -> dict | None:
    """FLOPs / bytes-accessed of a jitted callable at these args, from the
    compiled executable's cost analysis. Returns None when the backend
    doesn't expose it (never raises — benchmarks must not die on this)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returned [dict]
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        bytes_accessed = float(ca.get("bytes accessed", 0.0))
        if flops <= 0 and bytes_accessed <= 0:
            return None
        return {"flops": flops, "bytes": bytes_accessed}
    except Exception:
        return None


def roofline_fields(cost: dict | None, seconds: float) -> dict:
    """Achieved rates + % of v5e rooflines for one iteration taking
    `seconds` (use the pipelined per-iter time: blocking times carry the
    ~24 ms tunnel RTT). Returns {} when cost is unavailable."""
    if not cost or seconds <= 0:
        return {}
    tflops = cost["flops"] / seconds / 1e12
    gbs = cost["bytes"] / seconds / 1e9
    return {
        "gflops": round(cost["flops"] / 1e9, 1),
        "achieved_tflops": round(tflops, 2),
        "pct_f32_roofline": round(100.0 * tflops / V5E_PEAK_F32_TFLOPS, 1),
        "pct_bf16_roofline": round(100.0 * tflops / V5E_PEAK_BF16_TFLOPS, 1),
        # XLA's "bytes accessed" counts LOGICAL bytes per op, including
        # traffic that fusion keeps in registers/VMEM — an upper bound on
        # real HBM bytes, not a measurement (the headline forward "reads"
        # 167% of HBM bandwidth by this count). Reported for
        # arithmetic-intensity context, never as achieved bandwidth.
        "xla_logical_gb": round(cost["bytes"] / 1e9, 3),
        "xla_logical_gbps": round(gbs, 1),
        "flops_per_logical_byte": round(cost["flops"] / max(cost["bytes"], 1), 2),
    }
