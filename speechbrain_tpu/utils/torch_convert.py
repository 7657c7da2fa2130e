"""Torch checkpoint -> jax pytree conversion.

The reference's published HuggingFace checkpoints are torch state_dicts
(reference utils/checkpoints.py torch_save/torch_recovery). To load them
at metric parity we map keys and transpose layouts:

* Linear:      torch (out, in)        -> jax kernel (in, out)
* Conv1d:      torch (out, in/g, K)   -> jax kernel (K, in/g, out)
* Conv2d:      torch (out, in/g, H, W)-> jax (H, W, in/g, out)
* ConvT1d:     torch (in, out/g, K)   -> jax (K, out, in/g)
* BatchNorm:   weight/bias -> scale/bias; running stats -> batch_stats
* Embedding:   unchanged (num, dim)

Mapping from state_dict names to flax paths is model-specific; converters
register per-family rules here. Conversion is best-effort shape-driven
when no rule matches: a leaf with transposed shape is auto-transposed.
"""

import numpy as np

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def load_torch_state_dict(path):
    """Load a torch .ckpt into {name: np.ndarray} (CPU, no grad)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = map_old_state_dict_weights(dict(state))
    return {k: v.detach().numpy() for k, v in state.items() if hasattr(v, "numpy")}


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _candidate_transposes(src, dst_shape):
    """Yield transposed views of src that match dst_shape."""
    if src.shape == dst_shape:
        yield src
        return
    if src.ndim == 2 and src.T.shape == dst_shape:
        yield src.T
    if src.ndim == 3:
        for perm in [(2, 1, 0), (2, 0, 1), (0, 2, 1), (1, 2, 0)]:
            if np.transpose(src, perm).shape == dst_shape:
                yield np.transpose(src, perm)
    if src.ndim == 4:
        for perm in [(2, 3, 1, 0), (2, 3, 0, 1)]:
            if np.transpose(src, perm).shape == dst_shape:
                yield np.transpose(src, perm)


def load_torch_state_dict_into_pytree(path, target_tree, name_map=None, strict=False):
    """Pour a torch state_dict into a (nested-dict) target pytree.

    Matching strategy: explicit ``name_map`` first; otherwise keys are
    aligned by normalized name tokens and shape (with automatic layout
    transposition). Unmatched target leaves keep their current values
    (non-strict, like the reference's transfer hooks)."""
    state = load_torch_state_dict(path)
    flat_target = _flatten(target_tree)
    used = set()
    result = {}
    norm_state = {_normalize_torch_key(k): k for k in state}
    for tpath, tval in flat_target.items():
        tshape = tuple(np.asarray(tval).shape)
        key = None
        if name_map and tpath in name_map:
            key = name_map[tpath]
        else:
            tnorm = _normalize_target_path(tpath)
            key = norm_state.get(tnorm)
        if key is None:
            # shape-unique fallback
            cands = [
                k for k, v in state.items()
                if k not in used and _shape_compatible(v, tshape)
            ]
            if len(cands) == 1:
                key = cands[0]
        if key is None or key not in state:
            if strict:
                raise KeyError(f"No source for target leaf {tpath}")
            result[tpath] = tval
            continue
        src = state[key]
        for cand in _candidate_transposes(src, tshape):
            result[tpath] = np.asarray(cand, dtype=np.asarray(tval).dtype)
            used.add(key)
            break
        else:
            if strict:
                raise ValueError(
                    f"Shape mismatch {src.shape} -> {tshape} for {tpath} <- {key}"
                )
            result[tpath] = tval
    unmatched = [k for k in state if k not in used]
    if unmatched:
        logger.warning_once(
            f"torch->jax: {len(unmatched)} source keys unmatched, e.g. {unmatched[:5]}"
        )
    # device arrays, not np: loaded params must be indexable by tracers
    import jax.numpy as jnp

    result = {k: jnp.asarray(v) for k, v in result.items()}
    return _unflatten(result)


def _shape_compatible(src, dst_shape):
    return any(True for _ in _candidate_transposes(np.asarray(src), tuple(dst_shape)))


_RENAMES = {
    "weight": "kernel",
    "running_mean": "mean",
    "running_var": "var",
}


def _normalize_torch_key(key):
    toks = []
    for t in key.split("."):
        if t.isdigit():
            toks.append(t)
        else:
            toks.append(_RENAMES.get(t, t))
    return tuple(toks)


def _normalize_target_path(path):
    toks = []
    for t in path:
        # flax auto-names like Dense_0 -> dense 0
        toks.append(str(t))
    return tuple(toks)


# ---------------------------------------------------------------------------
# Rule-based exact converters (per model family)
# ---------------------------------------------------------------------------
#
# The shape-driven matcher above is best-effort; published checkpoints get
# exact per-family key maps so a wrong layer mapping fails loudly instead of
# silently degrading metrics (reference utils/parameter_transfer.py:188-299
# loads non-strict; we prefer strict for converters we ship).

import re

#: Sentinel a key_map_fn returns to DELIBERATELY drop a source key (e.g. a
#: fixed sinusoid buffer we recompute). ``None`` now means "unrecognized"
#: and raises under strict=True instead of silently skipping.
SKIP = object()

#: Torch bookkeeping keys that never carry weights; always droppable.
_ALWAYS_SKIP_SUFFIXES = ("num_batches_tracked",)


def pour_torch_keys(state, variables, key_map_fn, strict=True):
    """Pour a torch state_dict into flax ``variables`` using an exact
    per-key mapping.

    Arguments
    ---------
    state : dict name -> np.ndarray (from load_torch_state_dict)
    variables : nested dict with collections ("params", "batch_stats", ...)
    key_map_fn : torch key -> "collection/a/b/leaf" string, ``SKIP`` to
        deliberately drop the key, or None for "unrecognized".
    strict : raise if a mapped key is absent from the target, OR if any
        source key is unrecognized (key_map_fn returned None) — an
        unrecognized key (e.g. an upstream rename) would otherwise leave
        target leaves at random init and silently degrade outputs.

    Layout: 2-D leaves are transposed when needed; 3-D conv weights
    (out, in, K) -> (K, in, out); 4-D (out, in, H, W) -> (H, W, in, out).
    """
    flat = _flatten(variables)
    result = dict(flat)
    unmapped = []
    for key, src in state.items():
        if key.endswith(_ALWAYS_SKIP_SUFFIXES):
            continue
        dst = key_map_fn(key)
        if dst is SKIP:
            continue
        if dst is None:
            unmapped.append(key)
            continue
        if isinstance(dst, tuple):  # (dst, explicit transpose perm)
            dst, perm = dst
            src = np.transpose(np.asarray(src), perm)
        path = tuple(dst.split("/"))
        if path not in flat:
            if strict:
                raise KeyError(f"{key} -> {dst}: target leaf missing")
            continue
        tgt = np.asarray(flat[path])
        for cand in _candidate_transposes(np.asarray(src), tgt.shape):
            result[path] = np.asarray(cand, dtype=tgt.dtype)
            break
        else:
            raise ValueError(
                f"{key} -> {dst}: no layout {src.shape} -> {tgt.shape}"
            )
    if unmapped:
        msg = (
            f"{len(unmapped)} source keys unrecognized by the converter "
            f"(would leave target leaves at init): {sorted(unmapped)[:8]}"
        )
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    # device arrays, not np: poured params must be indexable by tracers
    # (np-leaf[tracer] raises TracerArrayConversionError under jit)
    import jax.numpy as jnp

    result = {k: jnp.asarray(v) for k, v in result.items()}
    return _unflatten(result)


def ecapa_key_map(key):
    """Reference ECAPA_TDNN state_dict key -> flax path in our ECAPA_TDNN
    (lobes/models/ECAPA_TDNN.py). Reference module tree:
    blocks.{i}.(conv|norm|tdnn1|res2net_block|tdnn2|se_block|shortcut),
    mfa, asp.(tdnn|conv), asp_bn, fc (ref ECAPA_TDNN.py:420-560)."""
    if key.endswith("num_batches_tracked"):
        return None
    k = re.sub(r"^blocks\.(\d+)\.", r"block_\1.", key)
    k = re.sub(
        r"\.res2net_block\.blocks\.(\d+)\.",
        lambda m: f".res2net.block_{int(m.group(1)) + 1}.",
        k,
    )
    k = k.replace(".se_block.", ".se.")
    k = k.replace(".conv.conv.", ".conv.")
    k = k.replace(".conv1.conv.", ".conv1.")
    k = k.replace(".conv2.conv.", ".conv2.")
    k = k.replace(".norm.norm.", ".norm.BatchNorm_0.")
    k = re.sub(r"^asp_bn\.norm\.", "asp_bn.BatchNorm_0.", k)
    k = re.sub(r"^fc\.conv\.", "fc.", k)
    k = re.sub(r"\.shortcut\.conv\.", ".shortcut.", k)
    if k.endswith(".running_mean"):
        return "batch_stats/" + k[: -len(".running_mean")].replace(".", "/") + "/mean"
    if k.endswith(".running_var"):
        return "batch_stats/" + k[: -len(".running_var")].replace(".", "/") + "/var"
    if k.endswith(".weight"):
        stem = k[: -len(".weight")]
        leaf = "scale" if "BatchNorm_0" in stem else "kernel"
        return "params/" + stem.replace(".", "/") + "/" + leaf
    if k.endswith(".bias"):
        return "params/" + k[: -len(".bias")].replace(".", "/") + "/bias"
    return None


def ecapa_classifier_key_map(key):
    """Reference ECAPA Classifier (ECAPA_TDNN.py:562) -> our Classifier.
    Reference: blocks.{i}.(linear|norm), weight (the AAM class matrix)."""
    if key.endswith("num_batches_tracked"):
        return None
    if key == "weight":
        return "params/weight"
    k = re.sub(r"^blocks\.(\d+)\.linear\.w\.", r"linear_\1.", key)
    k = re.sub(r"^blocks\.(\d+)\.norm\.norm\.", r"norm_\1.BatchNorm_0.", k)
    if k.endswith(".running_mean"):
        return "batch_stats/" + k[: -len(".running_mean")].replace(".", "/") + "/mean"
    if k.endswith(".running_var"):
        return "batch_stats/" + k[: -len(".running_var")].replace(".", "/") + "/var"
    if k.endswith(".weight"):
        stem = k[: -len(".weight")]
        leaf = "scale" if "BatchNorm_0" in stem else "kernel"
        return "params/" + stem.replace(".", "/") + "/" + leaf
    if k.endswith(".bias"):
        return "params/" + k[: -len(".bias")].replace(".", "/") + "/bias"
    return None


# Compatibility renames applied to every incoming torch state_dict
# (the reference's KEYS_MAPPING + map_old_state_dict_weights,
# utils/checkpoints.py:84-130): substring -> substring, covering
# checkpoints saved before upstream typo fixes.
KEYS_MAPPING = {
    ".mutihead_attn": ".multihead_attn",
    ".convs_intermedite": ".convs_intermediate",
}


def map_old_state_dict_weights(state_dict, mapping=None):
    """Rename keys by substring replacement (reference
    checkpoints.py:91). Returns the same dict, mutated."""
    mapping = KEYS_MAPPING if mapping is None else mapping
    for old_sub, new_sub in mapping.items():
        for old_key in list(state_dict.keys()):
            if old_sub in old_key:
                new_key = old_key.replace(old_sub, new_sub)
                state_dict[new_key] = state_dict.pop(old_key)
                logger.info(
                    "Compatibility rename %r -> %r", old_key, new_key
                )
    return state_dict


def crdnn_key_map(key):
    """Reference CRDNN (LSTM variant) state_dict key -> flax path in our
    CRDNN (lobes/models/CRDNN.py). Reference tree (ref CRDNN.py:16):
    CNN.block_{b}.(conv_{1,2}|norm_{1,2}), RNN.rnn (torch nn.LSTM keys),
    DNN.block_{b}.(linear|norm). LSTM biases must be pre-merged with
    merge_lstm_biases (torch keeps bias_ih + bias_hh separately; our
    hoisted input projection carries their sum)."""
    if key.endswith("num_batches_tracked"):
        return None
    m = re.match(r"^CNN\.block_(\d+)\.conv_(\d+)\.conv\.(weight|bias)$", key)
    if m:
        b, n, leaf = m.group(1), int(m.group(2)) - 1, m.group(3)
        if leaf == "weight":
            # reference Conv2d convolves (B, C, FREQ, TIME); ours is NHWC
            # (B, TIME, FREQ, C): torch (out, in, kF, kT) -> flax
            # (kT, kF, in, out) — the spatial axes swap, which shape
            # matching can't detect when the kernel is square
            return f"params/conv_{b}_{n}/kernel", (3, 2, 1, 0)
        return f"params/conv_{b}_{n}/bias"
    m = re.match(r"^CNN\.block_(\d+)\.norm_(\d+)\.norm\.(weight|bias)$", key)
    if m:
        b, n, leaf = m.group(1), int(m.group(2)) - 1, m.group(3)
        leaf = "scale" if leaf == "weight" else "bias"
        return f"params/cnn_norm_{b}_{n}/{leaf}"
    m = re.match(r"^RNN\.rnn\.weight_(ih|hh)_l(\d+)(_reverse)?$", key)
    if m:
        kind, layer, rev = m.group(1), m.group(2), m.group(3)
        d = 1 if rev else 0
        if kind == "ih":
            return f"params/rnn/wx_l{layer}_d{d}/kernel"
        return f"params/rnn/wh_l{layer}_d{d}"
    m = re.match(r"^RNN\.rnn\.bias_l(\d+)(_reverse)?$", key)
    if m:  # produced by merge_lstm_biases
        layer, rev = m.group(1), m.group(2)
        d = 1 if rev else 0
        return f"params/rnn/wx_l{layer}_d{d}/bias"
    if re.match(r"^RNN\.rnn\.bias_(ih|hh)_", key):
        raise ValueError(
            f"{key}: run merge_lstm_biases(state) before pouring"
        )
    m = re.match(r"^DNN\.block_(\d+)\.linear\.w\.(weight|bias)$", key)
    if m:
        b, leaf = m.group(1), m.group(2)
        leaf = "kernel" if leaf == "weight" else "bias"
        return f"params/dnn_{b}/{leaf}"
    m = re.match(
        r"^DNN\.block_(\d+)\.norm\.norm\.(weight|bias|running_mean|running_var)$",
        key,
    )
    if m:
        b, leaf = m.group(1), m.group(2)
        coll_leaf = {
            "weight": ("params", "scale"), "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }[leaf]
        return f"{coll_leaf[0]}/dnn_norm_{b}/BatchNorm_0/{coll_leaf[1]}"
    return None


def merge_lstm_biases(state):
    """torch LSTM keeps bias_ih and bias_hh separately; sum them into one
    ``bias_l{n}[_reverse]`` key (our scan cell adds a single bias)."""
    out = dict(state)
    for key in list(out):
        m = re.match(r"^(.*)\.bias_ih_l(\d+)(_reverse)?$", key)
        if not m:
            continue
        prefix, layer, rev = m.group(1), m.group(2), m.group(3) or ""
        hh = f"{prefix}.bias_hh_l{layer}{rev}"
        out[f"{prefix}.bias_l{layer}{rev}"] = out.pop(key) + out.pop(hh)
    return out


def conformer_encoder_key_map(key):
    """Reference ConformerEncoder state_dict key -> flax path in our
    ConformerEncoder (lobes/models/transformer/Conformer.py). Reference
    module tree (ref Conformer.py:333-722): layers.{i}.(ffn_module1|
    norm1|mha_layer|convolution_module|ffn_module2|norm2) + top-level
    norm. Use together with :func:`split_conformer_inproj`, which
    pre-splits the fused qkv projection and zero-fills our q/k/v biases
    (the reference RelPosMHAXL has no input-projection biases)."""
    k = re.sub(r"^layers\.(\d+)\.", r"layer_\1.", key)
    k = k.replace(".ffn_module1.0.", ".norm_ff1.LayerNorm_0.")
    k = k.replace(".ffn_module1.1.ffn.0.", ".ffn1.ffn1.")
    k = k.replace(".ffn_module1.1.ffn.3.", ".ffn1.ffn2.")
    k = k.replace(".ffn_module2.0.", ".norm_ff2.LayerNorm_0.")
    k = k.replace(".ffn_module2.1.ffn.0.", ".ffn2.ffn1.")
    k = k.replace(".ffn_module2.1.ffn.3.", ".ffn2.ffn2.")
    k = k.replace(".norm1.norm.", ".norm_mha.LayerNorm_0.")
    k = k.replace(".norm2.norm.", ".norm_out.LayerNorm_0.")
    k = k.replace(".mha_layer.out_proj.", ".attn.out_proj.")
    k = k.replace(".mha_layer.linear_pos.", ".attn.pos_proj.")
    k = k.replace(".convolution_module.layer_norm.",
                  ".conv.layer_norm.LayerNorm_0.")
    k = k.replace(".convolution_module.bottleneck.0.", ".conv.pw1.")
    k = k.replace(".convolution_module.conv.", ".conv.dw.")
    k = k.replace(".convolution_module.after_conv.0.",
                  ".conv.mid_norm.LayerNorm_0.")
    k = k.replace(".convolution_module.after_conv.2.", ".conv.pw2.")
    k = re.sub(r"^norm\.norm\.", "norm.LayerNorm_0.", k)
    if ".mha_layer.pos_bias_" in k:
        return "params/" + k.replace(
            ".mha_layer.pos_bias_", ".attn.pos_bias_"
        ).replace(".", "/")
    if k.endswith(".weight"):
        stem = k[: -len(".weight")]
        if "LayerNorm_0" in stem:
            return "params/" + stem.replace(".", "/") + "/scale"
        dst = "params/" + stem.replace(".", "/") + "/kernel"
        # 2-D linear weights need the explicit (out, in) -> (in, out)
        # transpose: auto-detection is ambiguous for square matrices
        if any(t in stem for t in (".ffn1.", ".ffn2.", ".out_proj",
                                   ".pos_proj")):
            return (dst, (1, 0))
        return dst
    if k.endswith(".bias"):
        return "params/" + k[: -len(".bias")].replace(".", "/") + "/bias"
    if k.endswith((".q_kernel", ".k_kernel", ".v_kernel")):
        which = k[-len("q_kernel")]
        stem = k[: -len(".q_kernel")]
        return ("params/" + stem.replace(".", "/")
                + f"/attn/{which}_proj/kernel")
    if k.endswith((".q_bias", ".k_bias", ".v_bias")):
        which = k[-len("q_bias")]
        stem = k[: -len(".q_bias")]
        return ("params/" + stem.replace(".", "/")
                + f"/attn/{which}_proj/bias")
    return None


def split_conformer_inproj(state, nhead):
    """Pre-split the reference RelPosMHAXL fused ``in_proj_weight``
    (3d, d) into q/k/v kernels and add zero q/k/v biases (the reference
    has none; our separate projections carry bias params). Also reshape
    the 2-D ``after_conv.2`` linear to a K=1 pointwise conv so the
    generic (out, in, K) -> (K, in, out) layout pass applies.

    CRUCIAL layout detail: the reference's self-attention fast path does
    ``linear(x, in_proj).view(B, T, H, 3*hd).chunk(3, -1)`` (ref
    nnet/attention.py:568-573) — the fused output is interleaved PER
    HEAD as [q_h | k_h | v_h] blocks, NOT three contiguous d-sized
    blocks. The split must follow that layout or every head reads the
    wrong rows."""
    out = dict(state)
    for key in list(out):
        if re.search(r"\.mha_layer\.pos_bias_[uv]$", key):
            # torch STORES pos_bias as (head_dim, nhead) but USES it via
            # .view(nhead, head_dim) (ref nnet/attention.py:508-513,
            # :660-666) — the pour must RESHAPE, not transpose. A shape-
            # based transpose silently corrupts every head whenever
            # head_dim != nhead (square cases coincide, which is why
            # small-dim parity tests can't catch it).
            w = np.asarray(out[key])
            hd, H = w.shape
            out[key] = w.reshape(H, hd)
        m = re.match(r"^(.*)\.mha_layer\.in_proj_weight$", key)
        if m:
            w = np.asarray(out.pop(key))
            d = w.shape[0] // 3
            hd = d // nhead
            prefix = m.group(1)
            # rows: head h occupies [h*3hd, (h+1)*3hd); within it
            # q = [0, hd), k = [hd, 2hd), v = [2hd, 3hd)
            per_head = w.reshape(nhead, 3, hd, w.shape[1])
            for i, which in enumerate("qkv"):
                rows = per_head[:, i].reshape(d, w.shape[1])
                # store already in flax (in, out) layout — square
                # matrices defeat shape-based transpose detection
                out[f"{prefix}.{which}_kernel"] = rows.T
                out[f"{prefix}.{which}_bias"] = np.zeros(
                    (w.shape[1],), w.dtype
                )
        if re.search(r"\.after_conv\.2\.weight$", key):
            w = np.asarray(out[key])
            out[key] = w[:, :, None]  # (out, in) -> (out, in, K=1)
    return out


def transformer_encoder_key_map(key):
    """Reference vanilla TransformerEncoder (lobes/models/transformer/
    Transformer.py:306, torch.nn.MultiheadAttention inside) -> our
    TransformerEncoder. Use with :func:`split_torch_mha_inproj` for the
    fused qkv (contiguous d-row blocks — torch's layout, unlike
    RelPosMHAXL's per-head fast path)."""
    k = re.sub(r"^layers\.(\d+)\.", r"layer_\1.", key)
    # conv-FFN ("1dcnn") variant: 3-D conv kernels ride the generic
    # (out, in, K) -> (K, in, out) layout pass, so return them BEFORE the
    # generic .weight branch adds a 2-D (1, 0) perm
    m = re.match(r"^(.*)\.pos_ffn\.(0|2)\.conv\.(weight|bias)$", k)
    if m:
        stem, idx, leaf = m.groups()
        conv = "ffn_conv1" if idx == "0" else "ffn_conv2"
        leaf = "kernel" if leaf == "weight" else "bias"
        return "params/" + stem.replace(".", "/") + f"/{conv}/{leaf}"
    k = k.replace(".self_att.att.out_proj.",
                  ".MultiheadAttention_0.out_proj.")
    k = k.replace(".pos_ffn.ffn.0.", ".ffn.ffn1.")
    k = k.replace(".pos_ffn.ffn.3.", ".ffn.ffn2.")
    k = k.replace(".norm1.norm.", ".norm1.LayerNorm_0.")
    k = k.replace(".norm2.norm.", ".norm2.LayerNorm_0.")
    k = re.sub(r"^norm\.norm\.", "norm.LayerNorm_0.", k)
    if k.endswith(".weight"):
        stem = k[: -len(".weight")]
        if "LayerNorm_0" in stem:
            return "params/" + stem.replace(".", "/") + "/scale"
        return ("params/" + stem.replace(".", "/") + "/kernel", (1, 0))
    if k.endswith(".bias"):
        return "params/" + k[: -len(".bias")].replace(".", "/") + "/bias"
    m = re.match(r"^(.*)\.self_att\.att\.([qkv])_(kernel|bias)$", k)
    if m:
        stem, which, leaf = m.groups()
        leaf = "kernel" if leaf == "kernel" else "bias"
        return ("params/" + stem.replace(".", "/")
                + f"/MultiheadAttention_0/{which}_proj/{leaf}")
    return None


def split_torch_mha_inproj(state):
    """Split torch.nn.MultiheadAttention fused in_proj weight/bias into
    q/k/v (contiguous d-row blocks, torch's documented layout). Kernels
    are stored pre-transposed to flax (in, out)."""
    out = dict(state)
    for key in list(out):
        m = re.match(r"^(.*)\.in_proj_weight$", key)
        if m:
            w = np.asarray(out.pop(key))
            d = w.shape[0] // 3
            for i, which in enumerate("qkv"):
                out[f"{m.group(1)}.{which}_kernel"] = (
                    w[i * d : (i + 1) * d].T
                )
        m = re.match(r"^(.*)\.in_proj_bias$", key)
        if m:
            b = np.asarray(out.pop(key))
            d = b.shape[0] // 3
            for i, which in enumerate("qkv"):
                out[f"{m.group(1)}.{which}_bias"] = b[i * d : (i + 1) * d]
    return out


def sepformer_masknet_key_map(key):
    """Reference Dual_Path_Model state_dict -> our DualPathModel
    (lobes/models/dual_path.py). Inner SBTransformerBlocks delegate to
    :func:`transformer_encoder_key_map`; run the state through
    :func:`split_torch_mha_inproj` and :func:`reshape_sepformer_convs`
    first."""
    if key.endswith("pos_enc.pe"):
        return SKIP  # fixed sinusoid buffer; we compute it
    m = re.match(r"^dual_mdl\.(\d+)\.(intra|inter)_mdl\.mdl\.(.*)$", key)
    if m:
        i, which, inner = m.groups()
        dst = transformer_encoder_key_map(inner)
        if dst is None:
            return None
        prefix = f"params/dual_{i}/{which}_mdl/enc/"
        if isinstance(dst, tuple):
            return (prefix + dst[0][len("params/"):], dst[1])
        return prefix + dst[len("params/"):]
    m = re.match(r"^dual_mdl\.(\d+)\.(intra|inter)_norm\.(weight|bias)$",
                 key)
    if m:
        i, which, leaf = m.groups()
        leaf = "scale" if leaf == "weight" else "bias"
        return f"params/dual_{i}/{which}_norm/GroupNorm_0/{leaf}"
    m = re.match(r"^dual_mdl\.(\d+)\.(intra|inter)_linear\.w\.(weight|bias)$",
                 key)
    if m:
        i, which, leaf = m.groups()
        if leaf == "weight":
            return (f"params/dual_{i}/{which}_proj/kernel", (1, 0))
        return f"params/dual_{i}/{which}_proj/bias"
    table = {
        "norm.weight": "params/norm/GroupNorm_0/scale",
        "norm.bias": "params/norm/GroupNorm_0/bias",
        "conv1d.weight": "params/conv1x1/kernel",
        "conv2d.weight": "params/conv_expand/kernel",
        "conv2d.bias": "params/conv_expand/bias",
        "end_conv1x1.weight": "params/end_conv1x1/kernel",
        "prelu.weight": "params/prelu1",
        "output.0.weight": "params/output_gate_a/kernel",
        "output.0.bias": "params/output_gate_a/bias",
        "output_gate.0.weight": "params/output_gate_b/kernel",
        "output_gate.0.bias": "params/output_gate_b/bias",
    }
    return table.get(key)


def reshape_sepformer_convs(state):
    """The reference's channel-expand conv is a (spks*N, N, 1, 1) 2-D
    conv; squeeze it to (out, in, K) so the generic 3-D layout pass
    lands on our 1x1 Conv1d kernel."""
    out = dict(state)
    if "conv2d.weight" in out:
        w = np.asarray(out["conv2d.weight"])
        if w.ndim == 4:
            out["conv2d.weight"] = w[:, :, :, 0]
    return out


def xvector_key_map(key):
    """Reference Xvector (lobes/models/Xvector.py:19) -> our Xvector.
    The reference builds a flat nn.ModuleList where block 3i is the TDNN
    conv, 3i+1 the activation, 3i+2 the BatchNorm, and the final block
    is the embedding Linear."""
    if key.endswith("num_batches_tracked"):
        return None
    m = re.match(r"^blocks\.(\d+)\.conv\.(weight|bias)$", key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        leaf = "kernel" if leaf == "weight" else "bias"
        return f"params/tdnn_{i // 3}/{leaf}"
    m = re.match(r"^blocks\.(\d+)\.norm\.(.+)$", key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        block = f"bn_{(i - 2) // 3}/BatchNorm_0"
        if leaf == "weight":
            return f"params/{block}/scale"
        if leaf == "bias":
            return f"params/{block}/bias"
        if leaf == "running_mean":
            return f"batch_stats/{block}/mean"
        if leaf == "running_var":
            return f"batch_stats/{block}/var"
    m = re.match(r"^blocks\.(\d+)\.w\.(weight|bias)$", key)
    if m:
        if m.group(2) == "weight":
            return ("params/embedding/kernel", (1, 0))
        return "params/embedding/bias"
    return None


def rnnlm_key_map(key):
    """Reference RNNLM (lobes/models/RNNLM.py) -> our RNNLM. Run the
    state through :func:`merge_lstm_biases` first (our scan cell adds a
    single merged bias; torch keeps bias_ih + bias_hh)."""
    if key == "embedding.Embedding.weight":
        return "params/emb/embedding"  # (vocab, emb): NO transpose
    m = re.match(r"^rnn\.rnn\.weight_ih_l(\d+)(_reverse)?$", key)
    if m:
        d = 1 if m.group(2) else 0
        return (f"params/rnn/wx_l{m.group(1)}_d{d}/kernel", (1, 0))
    m = re.match(r"^rnn\.rnn\.weight_hh_l(\d+)(_reverse)?$", key)
    if m:
        d = 1 if m.group(2) else 0
        return (f"params/rnn/wh_l{m.group(1)}_d{d}", (1, 0))
    m = re.match(r"^rnn\.rnn\.bias_l(\d+)(_reverse)?$", key)
    if m:
        d = 1 if m.group(2) else 0
        return f"params/rnn/wx_l{m.group(1)}_d{d}/bias"
    m = re.match(r"^dnn\.(?:block_)?(\d*)\.?linear\.w\.(weight|bias)$", key)
    if m:
        i = m.group(1) or "0"
        if m.group(2) == "weight":
            return (f"params/dnn_{i}/kernel", (1, 0))
        return f"params/dnn_{i}/bias"
    m = re.match(r"^dnn\.(?:block_)?(\d*)\.?norm\.norm\.(weight|bias)$",
                 key)
    if m:
        i = m.group(1) or "0"
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return f"params/norm_{i}/LayerNorm_0/{leaf}"
    m = re.match(r"^out\.w\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return ("params/out/kernel", (1, 0))
        return "params/out/bias"
    return None


def fuse_weight_norm(state):
    """Fuse torch weight-norm parametrization (weight_g, weight_v) into
    plain weights: W = g * v / ||v|| with the norm over all dims except
    the first (torch's weight_norm dim=0 default) — the HiFiGAN family
    stores every conv this way. Handles both the legacy ``weight_g`` /
    ``weight_v`` naming and the torch>=2.1 ``parametrizations.weight.
    original0`` (g) / ``original1`` (v) naming."""
    out = dict(state)
    for key in list(out):
        if key.endswith(".weight_v"):
            stem = key[: -len(".weight_v")]
            v = np.asarray(out.pop(key))
            g = np.asarray(out.pop(stem + ".weight_g"))
        elif key.endswith(".parametrizations.weight.original1"):
            stem = key[: -len(".parametrizations.weight.original1")]
            v = np.asarray(out.pop(key))
            g = np.asarray(
                out.pop(stem + ".parametrizations.weight.original0")
            )
        else:
            continue
        # infer the weight_norm dim from g's shape: the non-1 axis (all
        # axes otherwise); dim=0 for regular convs, dim=2 for BEATs'
        # pos_conv (ref beats.py:665 weight_norm(..., dim=2))
        axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1) or tuple(
            range(1, v.ndim)
        )
        norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
        out[stem + ".weight"] = g * v / np.maximum(norm, 1e-12)
    return out


def hifigan_generator_key_map(n_kernels):
    """Key-map factory for the reference HifiganGenerator
    (lobes/models/HifiGAN.py:371): torch flattens resblocks as
    ``resblocks[i_up * n_kernels + i_kernel]``; ours names them
    res_{i_up}_{i_kernel}. Run the state through
    :func:`fuse_weight_norm` first."""

    def key_map(key):
        k = key.replace(".conv.weight", ".weight").replace(
            ".conv.bias", ".bias"
        )
        m = re.match(r"^resblocks\.(\d+)\.convs(\d)\.(\d+)\.(weight|bias)$",
                     k)
        if m:
            flat, branch, j, leaf = (int(m.group(1)), m.group(2),
                                     m.group(3), m.group(4))
            u, kk = divmod(flat, n_kernels)
            leaf = "kernel" if leaf == "weight" else "bias"
            return f"params/res_{u}_{kk}/conv{branch}_{j}/{leaf}"
        m = re.match(r"^ups\.(\d+)\.(weight|bias)$", k)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            return f"params/up_{m.group(1)}/{leaf}"
        m = re.match(r"^(conv_pre|conv_post)\.(weight|bias)$", k)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            return f"params/{m.group(1)}/{leaf}"
        return None

    return key_map


def w2v_latent_key_map(key):
    """Reference W2VLatentExtractor (lobes/models/wav2vec.py:26) -> our
    W2VLatentExtractor: the ConvolutionFrontEnd blocks flatten to
    conv_{i}/norm_{i} plus the trailing plain LayerNorm."""
    m = re.match(
        r"^extractor\.convblock_(\d+)\.convs\.conv_0\.conv\.weight$", key
    )
    if m:
        return f"params/conv_{m.group(1)}/kernel"
    m = re.match(
        r"^extractor\.convblock_(\d+)\.convs\.norm_0\.norm\.(weight|bias)$",
        key,
    )
    if m:
        i, leaf = m.groups()
        leaf = "scale" if leaf == "weight" else "bias"
        return f"params/norm_{i}/LayerNorm_0/{leaf}"
    m = re.match(r"^norm\.(weight|bias)$", key)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return f"params/norm/{leaf}"
    return None


def beats_key_map(key):
    """Reference BEATs (lobes/models/beats.py:30) -> our BEATs. Run the
    state through :func:`fuse_weight_norm` first (pos_conv is weight-norm
    parametrized with dim=2). Only layer 0's relative_attention_bias is
    ever used (the pos_bias is computed once and passed down the stack,
    ref extract_features:819-831); later layers' tables are dropped."""
    if key == "patch_embedding.weight":
        # torch Conv2d (out, in, H, W) -> flax (H, W, in, out); spatial
        # dims are square so the perm must be explicit
        return ("params/patch_embedding/kernel", (2, 3, 1, 0))
    m = re.match(r"^layer_norm\.(weight|bias)$", key)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return f"params/layer_norm/{leaf}"
    m = re.match(r"^(post_extract_proj|predictor)\.(weight|bias)$", key)
    if m:
        which, leaf = m.groups()
        if leaf == "weight":
            return (f"params/{which}/kernel", (1, 0))
        return f"params/{which}/bias"
    m = re.match(r"^encoder\.pos_conv\.0\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return ("params/pos_conv/kernel", (2, 1, 0))
        return "params/pos_conv/bias"
    m = re.match(r"^encoder\.layer_norm\.(weight|bias)$", key)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return f"params/encoder_layer_norm/{leaf}"
    m = re.match(
        r"^encoder\.layers\.(\d+)\.self_attn\.relative_attention_bias\."
        r"weight$", key,
    )
    if m:
        if int(m.group(1)) == 0:
            return "params/rel_bias/embedding"
        return SKIP  # unused beyond layer 0 (shared pos_bias)
    m = re.match(
        r"^encoder\.layers\.(\d+)\.self_attn\.grep_a$", key
    )
    if m:
        return f"params/layer_{m.group(1)}/self_attn/grep_a"
    m = re.match(
        r"^encoder\.layers\.(\d+)\.self_attn\."
        r"(q_proj|k_proj|v_proj|out_proj|grep_linear)\.(weight|bias)$", key,
    )
    if m:
        i, which, leaf = m.groups()
        if leaf == "weight":
            return (f"params/layer_{i}/self_attn/{which}/kernel", (1, 0))
        return f"params/layer_{i}/self_attn/{which}/bias"
    m = re.match(
        r"^encoder\.layers\.(\d+)\.(self_attn_layer_norm|final_layer_norm|"
        r"fc1|fc2)\.(weight|bias)$", key,
    )
    if m:
        i, which, leaf = m.groups()
        if which in ("fc1", "fc2"):
            if leaf == "weight":
                return (f"params/layer_{i}/{which}/kernel", (1, 0))
            return f"params/layer_{i}/{which}/bias"
        ln = "ln1" if which == "self_attn_layer_norm" else "ln2"
        leaf = "scale" if leaf == "weight" else "bias"
        return f"params/layer_{i}/{ln}/{leaf}"
    return None


def fastspeech2_key_map(key):
    """Reference FastSpeech2 (lobes/models/FastSpeech2.py:390) -> our
    FastSpeech2: embedding prenet, conv-FFN FFT encoder/decoder (delegates
    to :func:`transformer_encoder_key_map`; run the state through
    :func:`split_torch_mha_inproj` first), masked variance predictors,
    pitch/energy embeds, mel linear and the LayerNorm conv postnet."""
    if key.endswith(".pe"):
        return SKIP  # fixed sinusoid buffers; we compute them
    if key == "encPreNet.token_embedding.Embedding.weight":
        return "params/emb/embedding"  # (vocab, d): NO transpose
    m = re.match(r"^(encoder|decoder)\.(.*)$", key)
    if m:
        which, inner = m.groups()
        dst = transformer_encoder_key_map(inner)
        if dst is None or dst is SKIP:
            return dst
        prefix = f"params/{which}/"
        if isinstance(dst, tuple):
            return (prefix + dst[0][len("params/"):], dst[1])
        return prefix + dst[len("params/"):]
    m = re.match(
        r"^(durPred|pitchPred|energyPred)\.(conv1|conv2|ln1|ln2|linear)\."
        r"(?:conv\.|norm\.|w\.)?(weight|bias)$", key,
    )
    if m:
        which, part, leaf = m.groups()
        ours = {
            "durPred": "duration_predictor",
            "pitchPred": "pitch_predictor",
            "energyPred": "energy_predictor",
        }[which]
        if part in ("conv1", "conv2"):
            sub = f"conv_{int(part[-1]) - 1}"
            leaf = "kernel" if leaf == "weight" else "bias"
            return f"params/{ours}/{sub}/{leaf}"
        if part in ("ln1", "ln2"):
            sub = f"ln_{int(part[-1]) - 1}/LayerNorm_0"
            leaf = "scale" if leaf == "weight" else "bias"
            return f"params/{ours}/{sub}/{leaf}"
        if leaf == "weight":
            return (f"params/{ours}/out/kernel", (1, 0))
        return f"params/{ours}/out/bias"
    m = re.match(r"^(pitchEmbed|energyEmbed)\.conv\.(weight|bias)$", key)
    if m:
        which, leaf = m.groups()
        ours = "pitch_embed" if which == "pitchEmbed" else "energy_embed"
        leaf = "kernel" if leaf == "weight" else "bias"
        return f"params/{ours}/{leaf}"
    m = re.match(r"^linear\.w\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return ("params/mel_linear/kernel", (1, 0))
        return "params/mel_linear/bias"
    m = re.match(r"^postnet\.conv_pre\.conv\.(weight|bias)$", key)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return f"params/postnet/conv_pre/{leaf}"
    m = re.match(
        r"^postnet\.convs_intermediate\.(\d+)\.conv\.(weight|bias)$", key
    )
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        leaf = "kernel" if leaf == "weight" else "bias"
        return f"params/postnet/conv_int_{i + 1}/{leaf}"
    m = re.match(r"^postnet\.conv_post\.conv\.(weight|bias)$", key)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return f"params/postnet/conv_post/{leaf}"
    m = re.match(r"^postnet\.ln(\d)\.(weight|bias)$", key)
    if m:
        i, leaf = m.groups()
        leaf = "scale" if leaf == "weight" else "bias"
        return f"params/postnet/ln{i}/LayerNorm_0/{leaf}"
    return None


def diffwave_key_map(key):
    """Reference DiffWave (lobes/models/DiffWave.py:357) -> our DiffWave.
    The 2-D upsampler ConvTranspose2d weights (1, 1, 3, 32) land on our
    (3, 32, 1, 1) kernels with an explicit (2, 3, 0, 1) perm (transposed
    convs keep (in, out, kH, kW) in torch, defeating the generic 4-D
    layout pass)."""
    m = re.match(r"^diffusion_embedding\.projection(\d)\.w\.(weight|bias)$",
                 key)
    if m:
        i, leaf = m.groups()
        dst = f"params/emb{i}/" + ("kernel" if leaf == "weight" else "bias")
        return (dst, (1, 0)) if leaf == "weight" else dst
    m = re.match(r"^spectrogram_upsampler\.conv(\d)\.(weight|bias)$", key)
    if m:
        i, leaf = m.groups()
        if leaf == "weight":
            return (f"params/upsampler/conv{i}_kernel", (2, 3, 0, 1))
        return f"params/upsampler/conv{i}_bias"
    m = re.match(
        r"^residual_layers\.(\d+)\.(dilated_conv|conditioner_projection|"
        r"output_projection)\.conv\.(weight|bias)$", key,
    )
    if m:
        i, which, leaf = m.groups()
        ours = {
            "dilated_conv": "dilated",
            "conditioner_projection": "cond",
            "output_projection": "out",
        }[which]
        leaf = "kernel" if leaf == "weight" else "bias"
        return f"params/res_{i}/{ours}/{leaf}"
    m = re.match(
        r"^residual_layers\.(\d+)\.diffusion_projection\.w\.(weight|bias)$",
        key,
    )
    if m:
        i, leaf = m.groups()
        if leaf == "weight":
            return (f"params/res_{i}/step_proj/kernel", (1, 0))
        return f"params/res_{i}/step_proj/bias"
    m = re.match(
        r"^(input_projection|skip_projection|output_projection)\.conv\."
        r"(weight|bias)$", key,
    )
    if m:
        which, leaf = m.groups()
        ours = {
            "input_projection": "in_proj",
            "skip_projection": "skip_proj",
            "output_projection": "out_proj",
        }[which]
        leaf = "kernel" if leaf == "weight" else "bias"
        return f"params/{ours}/{leaf}"
    if key == "diffusion_embedding.embedding":
        return SKIP  # fixed sinusoid table; we compute it
    return None


def merge_lstmcell_biases(state):
    """torch LSTMCell keeps plain ``bias_ih``/``bias_hh``; sum them into
    one ``bias`` key (our cells add a single bias)."""
    out = dict(state)
    for key in list(out):
        m = re.match(r"^(.*)\.bias_ih$", key)
        if not m:
            continue
        prefix = m.group(1)
        out[f"{prefix}.bias"] = out.pop(key) + out.pop(
            f"{prefix}.bias_hh"
        )
    return out


def tacotron2_key_map(key):
    """Reference Tacotron2 (lobes/models/Tacotron2.py:54) -> our
    Tacotron2. Run the state through :func:`merge_lstm_biases` (encoder
    biLSTM) and :func:`merge_lstmcell_biases` (attention/decoder cells)
    first. The tts-tacotron2-ljspeech checkpoint path."""
    if key.endswith("num_batches_tracked"):
        return None
    if key == "embedding.weight":
        return "params/embedding/embedding"
    m = re.match(r"^encoder\.convolutions\.(\d+)\.0\.conv\.(weight|bias)$",
                 key)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return f"params/encoder/conv_{m.group(1)}/{leaf}"
    m = re.match(r"^encoder\.convolutions\.(\d+)\.1\.(.+)$", key)
    if m:
        block = f"encoder/bn_{m.group(1)}/BatchNorm_0"
        leaf = m.group(2)
        return {
            "weight": f"params/{block}/scale",
            "bias": f"params/{block}/bias",
            "running_mean": f"batch_stats/{block}/mean",
            "running_var": f"batch_stats/{block}/var",
        }.get(leaf)
    m = re.match(r"^encoder\.lstm\.weight_(ih|hh)_l0(_reverse)?$", key)
    if m:
        d = 1 if m.group(2) else 0
        if m.group(1) == "ih":
            return (f"params/encoder/lstm/wx_l0_d{d}/kernel", (1, 0))
        return (f"params/encoder/lstm/wh_l0_d{d}", (1, 0))
    m = re.match(r"^encoder\.lstm\.bias_l0(_reverse)?$", key)
    if m:
        d = 1 if m.group(1) else 0
        return f"params/encoder/lstm/wx_l0_d{d}/bias"
    m = re.match(r"^decoder\.prenet\.layers\.(\d+)\.linear_layer\.weight$",
                 key)
    if m:
        return (f"params/prenet/linear_{m.group(1)}/kernel", (1, 0))
    m = re.match(r"^decoder\.(attention|decoder)_rnn\.(weight_ih|weight_hh|bias)$",
                 key)
    if m:
        which = "attn" if m.group(1) == "attention" else "dec"
        if m.group(2) == "weight_ih":
            return (f"params/{which}_wx/kernel", (1, 0))
        if m.group(2) == "weight_hh":
            return (f"params/{which}_wh", (1, 0))
        return f"params/{which}_wx/bias"
    table = {
        "decoder.attention_layer.query_layer.linear_layer.weight":
            ("params/attn_query/kernel", (1, 0)),
        "decoder.attention_layer.memory_layer.linear_layer.weight":
            ("params/attn_memory/kernel", (1, 0)),
        "decoder.attention_layer.v.linear_layer.weight":
            ("params/attn_v/kernel", (1, 0)),
        "decoder.attention_layer.location_layer.location_conv.conv.weight":
            "params/attn_loc_conv/kernel",
        "decoder.attention_layer.location_layer.location_dense.linear_layer.weight":
            ("params/attn_loc_dense/kernel", (1, 0)),
        "decoder.linear_projection.linear_layer.weight":
            ("params/mel_proj/kernel", (1, 0)),
        "decoder.linear_projection.linear_layer.bias":
            "params/mel_proj/bias",
        "decoder.gate_layer.linear_layer.weight":
            ("params/gate/kernel", (1, 0)),
        "decoder.gate_layer.linear_layer.bias": "params/gate/bias",
    }
    if key in table:
        return table[key]
    m = re.match(r"^postnet\.convolutions\.(\d+)\.0\.conv\.(weight|bias)$",
                 key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        leaf = "kernel" if leaf == "weight" else "bias"
        name = f"conv_{i}" if i < 4 else "conv_out"
        return f"params/postnet/{name}/{leaf}"
    m = re.match(r"^postnet\.convolutions\.(\d+)\.1\.(.+)$", key)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        name = f"bn_{i}" if i < 4 else "bn_out"
        block = f"postnet/{name}/BatchNorm_0"
        return {
            "weight": f"params/{block}/scale",
            "bias": f"params/{block}/bias",
            "running_mean": f"batch_stats/{block}/mean",
            "running_var": f"batch_stats/{block}/var",
        }.get(leaf)
    return None


def transformer_decoder_key_map(key):
    """Reference vanilla TransformerDecoder (Transformer.py:630) -> our
    TransformerDecoder: self_attn -> MultiheadAttention_0, the cross
    multihead_attn -> cross_attn, pos_ffn -> ffn, norms 1:1. Run the
    state through :func:`split_torch_mha_inproj` first."""
    k = re.sub(r"^layers\.(\d+)\.", r"layer_\1.", key)
    k = k.replace(".self_attn.att.out_proj.",
                  ".MultiheadAttention_0.out_proj.")
    k = k.replace(".multihead_attn.att.out_proj.",
                  ".cross_attn.out_proj.")
    k = k.replace(".pos_ffn.ffn.0.", ".ffn.ffn1.")
    k = k.replace(".pos_ffn.ffn.3.", ".ffn.ffn2.")
    for i in "123":
        k = k.replace(f".norm{i}.norm.", f".norm{i}.LayerNorm_0.")
    k = re.sub(r"^norm\.norm\.", "norm.LayerNorm_0.", k)
    m = re.match(
        r"^(.*)\.(self_attn|multihead_attn)\.att\.([qkv])_(kernel|bias)$", k
    )
    if m:
        stem, which, qkv, leaf = m.groups()
        attn = ("MultiheadAttention_0" if which == "self_attn"
                else "cross_attn")
        return ("params/" + stem.replace(".", "/")
                + f"/{attn}/{qkv}_proj/{leaf}")
    if k.endswith(".weight"):
        stem = k[: -len(".weight")]
        if "LayerNorm_0" in stem:
            return "params/" + stem.replace(".", "/") + "/scale"
        return ("params/" + stem.replace(".", "/") + "/kernel", (1, 0))
    if k.endswith(".bias"):
        return "params/" + k[: -len(".bias")].replace(".", "/") + "/bias"
    return None


def attentional_rnn_decoder_key_map(key):
    """Reference AttentionalRNNDecoder (nnet/RNN.py:767: GRU/LSTM cell
    stack + content/location attention + output proj) -> our
    AttentionalRNNDecoder. Covers the CRDNN seq2seq decoder of
    asr-crdnn-rnnlm-librispeech checkpoints."""
    m = re.match(r"^rnn\.rnn_cells\.(\d+)\.(weight|bias)_(ih|hh)$", key)
    if m:
        layer, kind, which = m.groups()
        if which == "ih":
            # input projection lives in the wx_{l} Linear
            leaf = "kernel" if kind == "weight" else "bias"
            dst = f"params/wx_{layer}/{leaf}"
            return (dst, (1, 0)) if kind == "weight" else dst
        # recurrent weights are bare params wh_{l} / bh_{l}
        if kind == "weight":
            return (f"params/wh_{layer}", (1, 0))
        return f"params/bh_{layer}"
    k = key
    if k.startswith("attn.") or k.startswith("proj."):
        stem, leaf = k.rsplit(".", 1)
        path = "params/" + stem.replace(".", "/")
        if leaf == "bias":
            return path + "/bias"
        if leaf == "weight":
            if ".conv_loc" in k:
                return path + "/kernel"  # (out,in,K) rides the 3-D pass
            return (path + "/kernel", (1, 0))
    return None


def _prefix_dst(dst, prefix):
    """Re-root a delegated key-map result under ``params/<prefix>/``."""
    if dst is None or dst is SKIP:
        return dst
    if isinstance(dst, tuple):
        inner, perm = dst
        return (_prefix_dst(inner, prefix), perm)
    coll, rest = dst.split("/", 1)
    return f"{coll}/{prefix}/{rest}"


def transformer_asr_key_map(module):
    """Factory: reference TransformerASR (lobes/models/transformer/
    TransformerASR.py:308-322) -> our TransformerASR. Delegates
    ``encoder.*`` to the encoder-module map and ``decoder.*`` to
    :func:`transformer_decoder_key_map`; maps the src projection and the
    normalized target embedding. Run the state through
    ``split_conformer_inproj`` (RelPosMHAXL fast path) and then
    ``split_torch_mha_inproj`` (decoder's torch MHA) first — the pour
    registry does both inline."""
    enc_map = {
        "conformer": conformer_encoder_key_map,
        "branchformer": branchformer_encoder_key_map,
        "transformer": transformer_encoder_key_map,
    }[module.encoder_module]

    def key_map(key):
        if key.startswith("encoder."):
            return _prefix_dst(enc_map(key[len("encoder."):]), "encoder")
        if key.startswith("decoder."):
            return _prefix_dst(
                transformer_decoder_key_map(key[len("decoder."):]), "decoder"
            )
        if key == "custom_src_module.layers.0.w.weight":
            return ("params/src_proj/kernel", (1, 0))
        if key == "custom_src_module.layers.0.w.bias":
            return "params/src_proj/bias"
        if key == "custom_tgt_module.layers.0.emb.Embedding.weight":
            return "params/tgt_emb/emb/embedding"
        if key.startswith("positional_encoding") and key.endswith(
            (".pe", ".inv_freq")
        ):
            return SKIP  # fixed sinusoid/RelPos buffers; we compute them
        return None

    return key_map


def transformerlm_key_map(key):
    """Reference TransformerLM (lobes/models/transformer/
    TransformerLM.py:106-118) -> our TransformerLM: normalized embedding
    (+ optional projection), vanilla encoder stack (delegated), and the
    Linear->LayerNorm->Linear output head. Run the state through
    :func:`split_torch_mha_inproj` first."""
    if key.startswith("encoder."):
        return _prefix_dst(
            transformer_encoder_key_map(key[len("encoder."):]), "encoder"
        )
    if key == "custom_src_module.emb.Embedding.weight":
        return "params/emb/emb/embedding"
    if key == "embedding_proj.w.weight":
        return ("params/emb_proj/kernel", (1, 0))
    if key == "embedding_proj.w.bias":
        return "params/emb_proj/bias"
    if key == "output_proj.layers.0.w.weight":
        return ("params/out_proj/kernel", (1, 0))
    if key == "output_proj.layers.0.w.bias":
        return "params/out_proj/bias"
    if key == "output_proj.layers.1.norm.weight":
        return "params/out_norm/scale"
    if key == "output_proj.layers.1.norm.bias":
        return "params/out_norm/bias"
    if key == "output_proj.layers.2.w.weight":
        return ("params/out/kernel", (1, 0))
    if key == "output_proj.layers.2.w.bias":
        return "params/out/bias"
    if key.startswith("positional_encoding") and key.endswith(
        (".pe", ".inv_freq")
    ):
        return SKIP
    return None


def branchformer_encoder_key_map(key):
    """Reference BranchformerEncoder (Branchformer.py) -> our
    BranchformerEncoder: RelPosMHAXL attention branch + cgMLP
    (pre/post channel proj, CSGU norm + depthwise conv) + merge proj.
    Run the state through :func:`split_conformer_inproj` (the
    RelPosMHAXL per-head fast-path layout) first."""
    k = re.sub(r"^layers\.(\d+)\.", r"layer_\1.", key)
    k = k.replace(".mha_layer.out_proj.", ".RelPosMHAXL_0.out_proj.")
    k = k.replace(".mha_layer.linear_pos.", ".RelPosMHAXL_0.pos_proj.")
    k = k.replace(".convolution_branch.pre_channel_proj.", ".cgmlp.up.")
    k = k.replace(".convolution_branch.post_channel_proj.",
                  ".cgmlp.down.")
    k = k.replace(".convolution_branch.csgu.norm.norm.",
                  ".cgmlp.csgu.norm.LayerNorm_0.")
    k = k.replace(".convolution_branch.csgu.conv.conv.",
                  ".cgmlp.csgu.dw_conv.")
    k = k.replace(".merge_proj.", ".merge.")
    k = k.replace(".norm_mhsa.norm.", ".norm_attn.LayerNorm_0.")
    k = k.replace(".norm_conv.norm.", ".norm_conv.LayerNorm_0.")
    k = re.sub(r"^norm\.norm\.", "norm_out.LayerNorm_0.", k)
    if ".mha_layer.pos_bias_" in k:
        return "params/" + k.replace(
            ".mha_layer.pos_bias_", ".RelPosMHAXL_0.pos_bias_"
        ).replace(".", "/")
    # split_conformer_inproj emits "<layer>.q_kernel" (the .mha_layer
    # segment is consumed by the splitter)
    m = re.match(r"^(.*)\.([qkv])_(kernel|bias)$", k)
    if m:
        stem, qkv, leaf = m.groups()
        return ("params/" + stem.replace(".", "/")
                + f"/RelPosMHAXL_0/{qkv}_proj/{leaf}")
    if k.endswith(".weight"):
        stem = k[: -len(".weight")]
        if "LayerNorm_0" in stem:
            return "params/" + stem.replace(".", "/") + "/scale"
        dst = "params/" + stem.replace(".", "/") + "/kernel"
        if any(t in stem for t in (".out_proj", ".pos_proj", ".up",
                                   ".down", ".merge")):
            return (dst, (1, 0))
        return dst
    if k.endswith(".bias"):
        return "params/" + k[: -len(".bias")].replace(".", "/") + "/bias"
    return None


def metricgan_generator_key_map(key):
    """Reference MetricGAN EnhancementGenerator (MetricGAN.py:59) -> our
    EnhancementGenerator: 2-layer biLSTM masker + 2 linears + learnable
    sigmoid slope. Run the state through :func:`merge_lstm_biases`."""
    m = re.match(r"^blstm\.rnn\.weight_(ih|hh)_l(\d+)(_reverse)?$", key)
    if m:
        d = 1 if m.group(3) else 0
        if m.group(1) == "ih":
            return (f"params/blstm/wx_l{m.group(2)}_d{d}/kernel", (1, 0))
        return (f"params/blstm/wh_l{m.group(2)}_d{d}", (1, 0))
    m = re.match(r"^blstm\.rnn\.bias_l(\d+)(_reverse)?$", key)
    if m:
        d = 1 if m.group(2) else 0
        return f"params/blstm/wx_l{m.group(1)}_d{d}/bias"
    table = {
        "linear1.weight": ("params/linear1/kernel", (1, 0)),
        "linear1.bias": "params/linear1/bias",
        "linear2.weight": ("params/linear2/kernel", (1, 0)),
        "linear2.bias": "params/linear2/bias",
        "Learnable_sigmoid.slope": "params/lsigmoid/slope",
    }
    return table.get(key)


def squeeze_resnet_attention_convs(state):
    """The reference ResNet's attentive pooling uses k=1 Conv1d layers;
    squeeze the trailing kernel dim so they pour into our Linears."""
    out = dict(state)
    for key in ("attention.0.weight", "attention.3.weight"):
        if key in out:
            w = np.asarray(out[key])
            if w.ndim == 3 and w.shape[-1] == 1:
                out[key] = w[:, :, 0]
    return out


def resnet_key_map(key):
    """Reference ResNet (lobes/models/ResNet.py:235) -> our ResNet.
    Run the state through :func:`squeeze_resnet_attention_convs`."""
    if key.endswith("num_batches_tracked"):
        return None

    def bn(block, leaf):
        return {
            "weight": f"params/{block}/BatchNorm_0/scale",
            "bias": f"params/{block}/BatchNorm_0/bias",
            "running_mean": f"batch_stats/{block}/BatchNorm_0/mean",
            "running_var": f"batch_stats/{block}/BatchNorm_0/var",
        }.get(leaf)

    m = re.match(r"^conv1\.weight$", key)
    if m:
        return "params/conv_in/kernel"
    m = re.match(r"^bn1\.(.+)$", key)
    if m:
        return bn("bn_in", m.group(1))
    m = re.match(r"^layer(\d)\.(\d+)\.(bn\d)\.(.+)$", key)
    if m:
        stage, i, which, leaf = m.groups()
        return bn(f"block_{int(stage) - 1}_{i}/{which}", leaf)
    m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
    if m:
        stage, i, c = m.groups()
        return f"params/block_{int(stage) - 1}_{i}/conv{c}/kernel"
    m = re.match(r"^layer(\d)\.(\d+)\.se\.fc\.(0|2)\.(weight|bias)$", key)
    if m:
        stage, i, idx, leaf = m.groups()
        fc = "fc1" if idx == "0" else "fc2"
        if leaf == "weight":
            return (f"params/block_{int(stage) - 1}_{i}/se/{fc}/kernel",
                    (1, 0))
        return f"params/block_{int(stage) - 1}_{i}/se/{fc}/bias"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
    if m:
        stage, i = m.groups()
        return f"params/block_{int(stage) - 1}_{i}/down/kernel"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.(.+)$", key)
    if m:
        stage, i, leaf = m.groups()
        return bn(f"block_{int(stage) - 1}_{i}/bn_down", leaf)
    m = re.match(r"^norm_stats\.(.+)$", key)
    if m:
        return bn("norm_stats", m.group(1))
    m = re.match(r"^attention\.0\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return ("params/attn_in/kernel", (1, 0))
        return "params/attn_in/bias"
    m = re.match(r"^attention\.2\.(.+)$", key)
    if m:
        return bn("attn_bn", m.group(1))
    m = re.match(r"^attention\.3\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return ("params/attn_out/kernel", (1, 0))
        return "params/attn_out/bias"
    m = re.match(r"^fc_embed\.(weight|bias)$", key)
    if m:
        if m.group(1) == "weight":
            return ("params/fc_embed/kernel", (1, 0))
        return "params/fc_embed/bias"
    m = re.match(r"^norm_embed\.(.+)$", key)
    if m:
        return bn("norm_embed", m.group(1))
    return None


# ---------------------------------------------------------------------------
# Exact-converter registry: flax module class name -> (preprocessors,
# key-map factory). pour_reference_checkpoint() dispatches through this,
# giving a one-call path from a reference torch .ckpt to our variables.
# ---------------------------------------------------------------------------

def sepformer_encoder_key_map(key):
    """Reference dual_path Encoder (one bias-free nn.Conv1d, ref
    dual_path.py:197-206) -> our Encoder: weight (O, I, K) -> conv/kernel
    (K, I, O). Registered exactly because the square (C, 1, C) shape
    defeats the heuristic loader's transpose detection."""
    if key == "conv1d.weight":
        return ("params/conv/kernel", (2, 1, 0))
    return None


def sepformer_decoder_key_map(key):
    """Reference dual_path Decoder (a bare nn.ConvTranspose1d subclass,
    ref dual_path.py:236) -> our Decoder: weight (I, O, K) ->
    deconv/kernel (K, O, I) (transpose_kernel layout, nnet/CNN.py)."""
    if key == "weight":
        return ("params/deconv/kernel", (2, 1, 0))
    if key == "bias":
        return "params/deconv/bias"
    return None


_POUR_REGISTRY = {
    # qualified class name: ([state preprocessors], key_map factory);
    # bare class names are looked up as a fallback, so only ambiguous
    # classes (e.g. the two `Classifier`s) need the full module path
    "ECAPA_TDNN": ([], lambda m: ecapa_key_map),
    "speechbrain_tpu.lobes.models.ECAPA_TDNN.Classifier": (
        [], lambda m: ecapa_classifier_key_map
    ),
    "Xvector": ([], lambda m: xvector_key_map),
    "ResNet": ([squeeze_resnet_attention_convs], lambda m: resnet_key_map),
    "CRDNN": ([merge_lstm_biases], lambda m: crdnn_key_map),
    "RNNLM": ([merge_lstm_biases], lambda m: rnnlm_key_map),
    "EnhancementGenerator": (
        [merge_lstm_biases], lambda m: metricgan_generator_key_map
    ),
    "TransformerEncoder": (
        [split_torch_mha_inproj], lambda m: transformer_encoder_key_map
    ),
    "TransformerDecoder": (
        [split_torch_mha_inproj], lambda m: transformer_decoder_key_map
    ),
    # (Branch|Conf)ormerEncoder qkv splits need nhead; handled inline
    "ConformerEncoder": ([], lambda m: conformer_encoder_key_map),
    "BranchformerEncoder": ([], lambda m: branchformer_encoder_key_map),
    "speechbrain_tpu.lobes.models.dual_path.Encoder": (
        [], lambda m: sepformer_encoder_key_map
    ),
    "speechbrain_tpu.lobes.models.dual_path.Decoder": (
        [], lambda m: sepformer_decoder_key_map
    ),
    "DualPathModel": (
        [split_torch_mha_inproj, reshape_sepformer_convs],
        lambda m: sepformer_masknet_key_map,
    ),
    "HifiganGenerator": (
        [fuse_weight_norm],
        lambda m: hifigan_generator_key_map(
            n_kernels=len(m.resblock_kernel_sizes)
        ),
    ),
    "Tacotron2": (
        [merge_lstm_biases, merge_lstmcell_biases],
        lambda m: tacotron2_key_map,
    ),
    "AttentionalRNNDecoder": ([], lambda m: attentional_rnn_decoder_key_map),
    "TransformerASR": ([], transformer_asr_key_map),
    "TransformerLM": ([split_torch_mha_inproj], lambda m: transformerlm_key_map),
    "DiffWave": ([], lambda m: diffwave_key_map),
    "FastSpeech2": ([split_torch_mha_inproj], lambda m: fastspeech2_key_map),
    "BEATs": ([fuse_weight_norm], lambda m: beats_key_map),
    "W2VLatentExtractor": ([], lambda m: w2v_latent_key_map),
}


def pour_reference_checkpoint(module, variables, path, strict=True):
    """Load a REFERENCE torch ``.ckpt`` state_dict into our flax
    ``variables`` using the exact, parity-tested converter for the
    module's architecture (every converter here is verified to 1e-4
    output parity in tests/integration/test_torch_checkpoint_parity.py).

    Arguments
    ---------
    module : flax module instance (selects the converter by class name).
    variables : the module's init() variables (shapes/dtypes to fill).
    path : torch checkpoint path (e.g. from an HF snapshot of
        speechbrain/asr-crdnn-rnnlm-librispeech).
    strict : raise on unmapped/missing keys.

    Falls back to the name-heuristic loader for unregistered classes.
    """
    qualname = f"{type(module).__module__}.{type(module).__name__}"
    name = (
        qualname if qualname in _POUR_REGISTRY else type(module).__name__
    )
    if name not in _POUR_REGISTRY:
        # Name/shape-heuristic fallback: strict matching would raise for
        # any target leaf without a source (e.g. computed buffers), so a
        # class WITHOUT a registered exact converter loads non-strict —
        # supplying it in Pretrainer(modules=...) must not make a load
        # fail that would have succeeded without it.
        logger.warning(
            "%s has no registered exact converter; falling back to the "
            "name/shape-heuristic (non-strict) torch loader", name,
        )
        return load_torch_state_dict_into_pytree(
            path, variables, strict=False
        )
    state = load_torch_state_dict(path)
    preprocessors, map_factory = _POUR_REGISTRY[name]
    for pre in preprocessors:
        state = pre(state)
    if name in ("ConformerEncoder", "BranchformerEncoder", "TransformerASR"):
        # the RelPosMHAXL fast path interleaves qkv per head
        state = split_conformer_inproj(state, nhead=module.nhead)
    if name == "TransformerASR":
        # AFTER the RelPosMHAXL split (which consumes the encoder's
        # `.mha_layer.in_proj_weight`): the decoder's torch MHA uses
        # contiguous d-row blocks
        state = split_torch_mha_inproj(state)
    return pour_torch_keys(state, variables, map_factory(module),
                           strict=strict)
