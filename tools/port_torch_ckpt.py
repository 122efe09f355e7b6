"""Port a reference GraspBalance torch checkpoint to flax variables.

The reference saves {epoch, model_state_dict, optimizer_state_dict, loss}
(train.py:226-234); module names come from TrainModel/graspbalance.py:122-137
(view_estimator/grasp_generator), modules.py:49-175 (heads) and drp.py:150-308
(DRP backbone). This maps every parameter/buffer onto the graspbalance_tpu
flax tree (models/graspbalance.py):

  view_estimator.FeatureExtraction.*      -> params['backbone']
    sa{i}.mlp_module.layer{j}             -> sa{i}.mlp.layer{j}
    fp{i}.mlp.layer{j}                    -> fp{i}.mlp.layer{j}
    InvResMLP_blocks{s}.{k}.convs.convs.0 -> block{s}_{k}.local_agg.conv
    InvResMLP_blocks{s}.{k}.pwconv.{0,1}  -> block{s}_{k}.pw{1,2}
  view_estimator.GraspableClasification   -> params['graspable']
  grasp_generator.WidthGroup{n}.mlps      -> width_grouping.mlp_scale{n-1}
  grasp_generator.GraspParameters         -> grasp_params
  grasp_generator.tolerance               -> tolerance
  grasp_generator.fuse_multi_scale        -> fuse_multi_scale
  grasp_generator.gate_fusion.0           -> gate_fusion

Weight layout: torch 1x1 Conv1d/2d (O, I, 1[, 1]) -> Dense kernel (I, O).
BatchNorm: weight/bias -> scale/bias (params); running_mean/var -> mean/var
(batch_stats); num_batches_tracked dropped. The reference's head convs keep a
bias *in front of* their BatchNorm (pytorch_utils.Conv1d default); before BN
a conv bias only shifts the running mean, so it is folded exactly:
mean' = running_mean - conv_bias (our MLPBlock is bias-free under BN).
"""

from __future__ import annotations

import re

import numpy as np


def _put(tree: dict, path: tuple, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate target {path}")
    node[path[-1]] = value


def _kernel(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv (O,I,1[,1]) or linear (O,I) -> dense kernel (I,O)."""
    w = np.asarray(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return np.ascontiguousarray(w.T)


_BN_PARAMS = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def _backbone_path(rest: str):
    """view_estimator.FeatureExtraction.<rest> -> (module path, leaf kind)."""
    m = re.match(r"(sa\d)\.mlp_module\.(layer\d)\.(conv|bn\.bn)\.(\w+)$", rest)
    if m:
        return ("backbone", m.group(1), "mlp", m.group(2)), m.group(3), m.group(4)
    m = re.match(r"(fp\d)\.mlp\.(layer\d)\.(conv|bn\.bn)\.(\w+)$", rest)
    if m:
        return ("backbone", m.group(1), "mlp", m.group(2)), m.group(3), m.group(4)
    m = re.match(
        r"InvResMLP_blocks(\d)\.(\d+)\.convs\.convs\.0\.([01])\.(\w+)$", rest
    )
    if m:
        stage, k, cb, leaf = m.groups()
        return (
            ("backbone", f"block{stage}_{k}", "local_agg", "conv"),
            "conv" if cb == "0" else "bn.bn",
            leaf,
        )
    m = re.match(r"InvResMLP_blocks(\d)\.(\d+)\.pwconv\.([01])\.([01])\.(\w+)$", rest)
    if m:
        stage, k, pw, cb, leaf = m.groups()
        return (
            ("backbone", f"block{stage}_{k}", f"pw{int(pw) + 1}"),
            "conv" if cb == "0" else "bn.bn",
            leaf,
        )
    raise KeyError(rest)


def convert_state_dict(sd: dict) -> dict:
    """torch state_dict (name -> array-like) -> {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}
    bn_mean_fold: dict[tuple, np.ndarray] = {}  # path -> conv bias to fold

    def handle_block(base: tuple, kind: str, leaf: str, v):
        """One MLPBlock-shaped target: base is the flax module path."""
        if kind == "conv":
            if leaf == "weight":
                _put(params, base + ("dense", "kernel"), _kernel(v))
            elif leaf == "bias":
                # bias before BN: fold into the running mean later
                bn_mean_fold[base + ("bn",)] = np.asarray(v)
            else:
                raise KeyError(leaf)
        else:  # bn.bn
            if leaf in _BN_PARAMS:
                _put(params, base + ("bn", _BN_PARAMS[leaf]), np.asarray(v))
            elif leaf in _BN_STATS:
                _put(stats, base + ("bn", _BN_STATS[leaf]), np.asarray(v))
            elif leaf != "num_batches_tracked":
                raise KeyError(leaf)

    def handle_head(head: tuple, rest: str, v, final_conv: str):
        """convN/bnN heads (GraspableClasification, GraspParameters,
        tolerance): convN+bnN pairs, final conv plain with bias."""
        m = re.match(r"conv(\d)\.(weight|bias)$", rest)
        if m:
            n, leaf = m.groups()
            if f"conv{n}" == final_conv:
                if leaf == "weight":
                    _put(params, head + (f"conv{n}", "kernel"), _kernel(v))
                else:
                    _put(params, head + (f"conv{n}", "bias"), np.asarray(v))
            else:
                handle_block(head + (f"conv{n}",), "conv", leaf, v)
            return
        m = re.match(r"bn(\d)\.(\w+)$", rest)
        if m:
            n, leaf = m.groups()
            handle_block(head + (f"conv{n}",), "bn.bn", leaf, v)
            return
        raise KeyError(rest)

    for name, v in sd.items():
        name = name.removeprefix("module.")
        if name.endswith("num_batches_tracked"):
            continue
        if name.startswith("view_estimator.FeatureExtraction."):
            rest = name.removeprefix("view_estimator.FeatureExtraction.")
            base, kind, leaf = _backbone_path(rest)
            handle_block(base, kind, leaf, v)
        elif name.startswith("view_estimator.GraspableClasification."):
            rest = name.removeprefix("view_estimator.GraspableClasification.")
            handle_head(("graspable",), rest, v, final_conv="conv3")
        elif name.startswith("grasp_generator.WidthGroup"):
            m = re.match(
                r"grasp_generator\.WidthGroup(\d)\.mlps\.(layer\d)\."
                r"(conv|bn\.bn)\.(\w+)$",
                name,
            )
            if not m:
                raise KeyError(name)
            n, layer, kind, leaf = m.groups()
            base = ("width_grouping", f"mlp_scale{int(n) - 1}", layer)
            handle_block(base, kind, leaf, v)
        elif name.startswith("grasp_generator.GraspParameters."):
            rest = name.removeprefix("grasp_generator.GraspParameters.")
            handle_head(("grasp_params",), rest, v, final_conv="conv3")
        elif name.startswith("grasp_generator.tolerance."):
            rest = name.removeprefix("grasp_generator.tolerance.")
            handle_head(("tolerance",), rest, v, final_conv="conv3")
        elif name.startswith("grasp_generator.fuse_multi_scale."):
            leaf = name.rsplit(".", 1)[1]
            if leaf == "weight":
                _put(params, ("fuse_multi_scale", "kernel"), _kernel(v))
            else:
                _put(params, ("fuse_multi_scale", "bias"), np.asarray(v))
        elif name.startswith("grasp_generator.gate_fusion.0."):
            leaf = name.rsplit(".", 1)[1]
            if leaf == "weight":
                _put(params, ("gate_fusion", "kernel"), _kernel(v))
            else:
                _put(params, ("gate_fusion", "bias"), np.asarray(v))
        else:
            raise KeyError(f"unmapped reference parameter: {name}")

    # fold head conv biases into their BN running means (exact: BN subtracts
    # the mean, so shifting input by b == shifting the stored mean by b)
    for bn_path, bias in bn_mean_fold.items():
        node = stats
        for p in bn_path[:-1]:
            node = node[p]
        node[bn_path[-1]]["mean"] = node[bn_path[-1]]["mean"] - bias

    return {"params": params, "batch_stats": stats}


def main():
    import argparse
    import pickle

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="reference checkpoint.tar (torch.save)")
    p.add_argument("out", help="output .pkl with {'params','batch_stats'}")
    args = p.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert_state_dict(sd)
    with open(args.out, "wb") as f:
        pickle.dump(variables, f)
    n = len(sd)
    print(f"converted {n} tensors -> {args.out}")


if __name__ == "__main__":
    main()
