"""CLIP / T5-XXL text encoders (SD3 conditioning stack).

Behavioural spec: mimogpt/models/selftok/sd3/other_impls.py:98-639. The
reference ships these for SD3 text conditioning but never invokes them from
any tokenizer runtime path; they are ported for component completeness and
for serving SD3-style conditioned decoding should real checkpoints require
text prompts.

TPU-first shape: pure functions over param pytrees, `lax.scan` over stacked
layer params (one compiled block body per model instead of per-layer HLO),
static sequence lengths, causal/relative-position biases precomputed outside
the scan. The "grab hidden state of layer i" feature (intermediate_output)
is realised by splitting the scan at a *static* layer index — no per-layer
Python loop, no dynamic control flow inside jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from selftoktokenizer_tpu.core import convert as cv
from selftoktokenizer_tpu.ops.attention import mha
from selftoktokenizer_tpu.ops.linear import linear, linear_init, mlp, mlp_init
from selftoktokenizer_tpu.ops.norms import layer_norm, rms_norm

# ---------------------------------------------------------------------------
# CLIP (other_impls.py:98-223)
# ---------------------------------------------------------------------------

# quick_gelu is the OpenAI-CLIP activation (other_impls.py:116-119)
ACTIVATIONS = {
    "quick_gelu": lambda a: a * jax.nn.sigmoid(1.702 * a),
    "gelu": lambda a: jax.nn.gelu(a, approximate=False),
}


@dataclasses.dataclass
class CLIPTextConfig:
    """Mirrors the HF config dict consumed by CLIPTextModel_
    (other_impls.py:175-181)."""
    num_hidden_layers: int = 12
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"
    vocab_size: int = 49408
    num_positions: int = 77


def clip_layer_apply(p, cfg: CLIPTextConfig, x, mask):
    """Pre-LN CLIP layer (other_impls.py:121-141). torch LayerNorm default
    eps=1e-5 here (not the 1e-6 used elsewhere in the reference)."""
    h = layer_norm(x, **p["ln1"], eps=1e-5)
    q, k, v = (linear(p["attn"][n], h) for n in ("q", "k", "v"))
    x = x + linear(p["attn"]["out"], mha(q, k, v, cfg.num_attention_heads,
                                         mask=mask))
    x = x + mlp(p["mlp"], layer_norm(x, **p["ln2"], eps=1e-5),
                act=ACTIVATIONS[cfg.hidden_act])
    return x


def _split_scan(blocks, body, x, n_layers, intermediate_output):
    """Scan over stacked layer params, optionally capturing the hidden state
    after static layer index ``intermediate_output`` (negative = from end,
    reference semantics other_impls.py:151-156)."""
    if intermediate_output is None:
        x, _ = jax.lax.scan(body, x, blocks)
        return x, None
    io = intermediate_output
    if io < 0:
        io = n_layers + io
    head = jax.tree_util.tree_map(lambda t: t[: io + 1], blocks)
    tail = jax.tree_util.tree_map(lambda t: t[io + 1:], blocks)
    x, _ = jax.lax.scan(body, x, head)
    inter = x
    x, _ = jax.lax.scan(body, x, tail)
    return x, inter


def clip_text_apply(params, cfg: CLIPTextConfig, tokens,
                    intermediate_output: Optional[int] = None,
                    final_layer_norm_intermediate: bool = True):
    """CLIPTextModel forward (other_impls.py:175-223).

    tokens: [B, L] int32. Returns (last_hidden, intermediate, projected
    pooled, raw pooled) — the reference 4-tuple. Pooling takes the position
    of the per-row *max token id* (= the end token, other_impls.py:194-198).
    """
    x = params["token_embedding"][tokens] \
        + params["position_embedding"][: tokens.shape[1]]
    L = tokens.shape[1]
    causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)

    def body(h, bp):
        return clip_layer_apply(bp, cfg, h, causal), None

    x, inter = _split_scan(params["layers"], body, x,
                           cfg.num_hidden_layers, intermediate_output)
    x = layer_norm(x, **params["final_layer_norm"], eps=1e-5)
    if inter is not None and final_layer_norm_intermediate:
        inter = layer_norm(inter, **params["final_layer_norm"], eps=1e-5)
    pooled = x[jnp.arange(x.shape[0]), jnp.argmax(tokens, axis=-1)]
    projected = linear(params["text_projection"], pooled)
    return x, inter, projected, pooled


def clip_text_init(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    D = cfg.hidden_size

    def layer_init(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        return {
            "ln1": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "ln2": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
            "attn": {"q": linear_init(k1, D, D, dtype=dtype),
                     "k": linear_init(k2, D, D, dtype=dtype),
                     "v": linear_init(k3, D, D, dtype=dtype),
                     "out": linear_init(k4, D, D, dtype=dtype)},
            "mlp": mlp_init(k5, D, cfg.intermediate_size, dtype=dtype),
        }

    layers = [layer_init(k)
              for k in jax.random.split(ks[0], cfg.num_hidden_layers)]
    return {
        "token_embedding": 0.02 * jax.random.normal(
            ks[1], (cfg.vocab_size, D), dtype),
        "position_embedding": 0.02 * jax.random.normal(
            ks[2], (cfg.num_positions, D), dtype),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_layer_norm": {"scale": jnp.ones((D,), dtype),
                             "bias": jnp.zeros((D,), dtype)},
        # reference initialises text_projection to identity
        # (other_impls.py:209-210)
        "text_projection": {"w": jnp.eye(D, dtype=dtype)},
    }


def clip_text_from_state_dict(sd, cfg: CLIPTextConfig):
    """Convert a reference ``CLIPTextModel`` state dict."""
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"text_model.encoder.layers.{i}."
        layers.append({
            "ln1": cv.t_layernorm(sd, pre + "layer_norm1"),
            "ln2": cv.t_layernorm(sd, pre + "layer_norm2"),
            "attn": {"q": cv.t_linear(sd, pre + "self_attn.q_proj"),
                     "k": cv.t_linear(sd, pre + "self_attn.k_proj"),
                     "v": cv.t_linear(sd, pre + "self_attn.v_proj"),
                     "out": cv.t_linear(sd, pre + "self_attn.out_proj")},
            "mlp": cv.t_mlp(sd, pre + "mlp"),
        })
    return {
        "token_embedding": cv._np(
            sd["text_model.embeddings.token_embedding.weight"]),
        "position_embedding": cv._np(
            sd["text_model.embeddings.position_embedding.weight"]),
        "layers": cv.stack_blocks(layers),
        "final_layer_norm": cv.t_layernorm(sd, "text_model.final_layer_norm"),
        "text_projection": cv.t_linear(sd, "text_projection"),
    }


# ---------------------------------------------------------------------------
# T5-XXL encoder (other_impls.py:426-639)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class T5Config:
    """Mirrors the HF config dict consumed by T5 (other_impls.py:616-630);
    inner_dim == d_model in the reference wiring."""
    num_layers: int = 24
    d_model: int = 4096
    d_ff: int = 10240
    num_heads: int = 64
    vocab_size: int = 32128
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128


def t5_relative_position_bucket(relative_position, num_buckets=32,
                                max_distance=128):
    """Bidirectional mesh-TF bucket mapping (other_impls.py:484-530),
    vectorised in jnp on a static [L, L] grid."""
    num_buckets //= 2
    rel_buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, num_buckets - 1)
    return rel_buckets + jnp.where(is_small, rp, rp_large)


def t5_compute_bias(bias_table, cfg: T5Config, length):
    """[1, H, L, L] additive attention bias (other_impls.py:532-546)."""
    pos = jnp.arange(length)
    rel = pos[None, :] - pos[:, None]
    buckets = t5_relative_position_bucket(
        rel, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    return bias_table[buckets].transpose(2, 0, 1)[None]


def t5_block_apply(p, cfg: T5Config, x, bias):
    """T5Block = self-attention + gated-GELU FF, both pre-RMSNorm, no
    attention scaling (k pre-scaled by sqrt(head_dim) to cancel the SDPA
    1/sqrt(d) — other_impls.py:549-552)."""
    h = rms_norm(x, p["attn_norm"]["weight"])
    q = linear(p["attn"]["q"], h)
    k = linear(p["attn"]["k"], h)
    v = linear(p["attn"]["v"], h)
    head_dim = k.shape[-1] // cfg.num_heads
    attn = mha(q, k * math.sqrt(head_dim), v, cfg.num_heads, mask=bias)
    x = x + linear(p["attn"]["o"], attn)
    h = rms_norm(x, p["ff_norm"]["weight"])
    gelu = jax.nn.gelu(linear(p["ff"]["wi_0"], h), approximate=True)
    x = x + linear(p["ff"]["wo"], gelu * linear(p["ff"]["wi_1"], h))
    return x


def t5_apply(params, cfg: T5Config, tokens,
             intermediate_output: Optional[int] = None,
             final_layer_norm_intermediate: bool = True):
    """T5Stack forward (other_impls.py:582-614): relative bias computed by
    block 0 and shared by every block. Returns (last_hidden, intermediate)."""
    x = params["embed_tokens"][tokens]
    bias = t5_compute_bias(params["relative_attention_bias"], cfg,
                           tokens.shape[1]).astype(x.dtype)

    def body(h, bp):
        return t5_block_apply(bp, cfg, h, bias), None

    x, inter = _split_scan(params["blocks"], body, x, cfg.num_layers,
                           intermediate_output)
    x = rms_norm(x, params["final_layer_norm"]["weight"])
    if inter is not None and final_layer_norm_intermediate:
        inter = rms_norm(inter, params["final_layer_norm"]["weight"])
    return x, inter


def t5_init(key, cfg: T5Config, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    D, F = cfg.d_model, cfg.d_ff

    def block_init(k):
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(k, 7)
        return {
            "attn_norm": {"weight": jnp.ones((D,), dtype)},
            "attn": {"q": linear_init(k1, D, D, bias=False, dtype=dtype),
                     "k": linear_init(k2, D, D, bias=False, dtype=dtype),
                     "v": linear_init(k3, D, D, bias=False, dtype=dtype),
                     "o": linear_init(k4, D, D, bias=False, dtype=dtype)},
            "ff_norm": {"weight": jnp.ones((D,), dtype)},
            "ff": {"wi_0": linear_init(k5, D, F, bias=False, dtype=dtype),
                   "wi_1": linear_init(k6, D, F, bias=False, dtype=dtype),
                   "wo": linear_init(k7, F, D, bias=False, dtype=dtype)},
        }

    blocks = [block_init(k) for k in jax.random.split(ks[0], cfg.num_layers)]
    return {
        "embed_tokens": 0.02 * jax.random.normal(
            ks[1], (cfg.vocab_size, D), dtype),
        "relative_attention_bias": 0.02 * jax.random.normal(
            ks[2], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layer_norm": {"weight": jnp.ones((D,), dtype)},
    }


def t5_from_state_dict(sd, cfg: T5Config):
    """Convert a reference ``T5`` state dict (other_impls.py:616-630)."""
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer."
        blocks.append({
            "attn_norm": cv.t_rmsnorm(sd, pre + "0.layer_norm"),
            "attn": {n: cv.t_linear(sd, pre + f"0.SelfAttention.{n}")
                     for n in ("q", "k", "v", "o")},
            "ff_norm": cv.t_rmsnorm(sd, pre + "1.layer_norm"),
            "ff": {n: cv.t_linear(sd, pre + f"1.DenseReluDense.{n}")
                   for n in ("wi_0", "wi_1", "wo")},
        })
    return {
        "embed_tokens": cv._np(sd["encoder.embed_tokens.weight"]),
        "relative_attention_bias": cv._np(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"]),
        "blocks": cv.stack_blocks(blocks),
        "final_layer_norm": cv.t_rmsnorm(sd, "encoder.final_layer_norm"),
    }


# ---------------------------------------------------------------------------
# SD-CLIP wrappers + prompt tokenization (other_impls.py:225-423)
# ---------------------------------------------------------------------------

class SDTokenizer:
    """Prompt -> (token, weight) list assembly (other_impls.py:225-271).

    Pure-Python preprocessing (runs on host, never traced). ``tokenizer`` is
    any HF-style tokenizer object; the reference hardcodes local
    ``/cache/sd3`` checkpoints, here the caller supplies it."""

    def __init__(self, max_length=77, pad_with_end=True, tokenizer=None,
                 has_start_token=True, pad_to_max_length=True,
                 min_length=None):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.min_length = min_length
        empty = self.tokenizer("")["input_ids"]
        if has_start_token:
            self.tokens_start = 1
            self.start_token = empty[0]
            self.end_token = empty[1]
        else:
            self.tokens_start = 0
            self.start_token = None
            self.end_token = empty[0]
        self.pad_with_end = pad_with_end
        self.pad_to_max_length = pad_to_max_length

    def tokenize_with_weights(self, text: str):
        pad_token = self.end_token if self.pad_with_end else 0
        batch = []
        if self.start_token is not None:
            batch.append((self.start_token, 1.0))
        words = [w for w in text.replace("\n", " ").split(" ") if w != ""]
        for word in words:
            batch.extend(
                (t, 1.0) for t in
                self.tokenizer(word)["input_ids"][self.tokens_start:-1])
        batch.append((self.end_token, 1.0))
        if self.pad_to_max_length:
            batch.extend([(pad_token, 1.0)] * (self.max_length - len(batch)))
        if self.min_length is not None and len(batch) < self.min_length:
            batch.extend([(pad_token, 1.0)] * (self.min_length - len(batch)))
        return [batch]


class SD3Tokenizer:
    """Tri-encoder prompt tokenization (other_impls.py:279-292): CLIP-L,
    CLIP-G (no end-padding) and T5-XXL (min length 77, unbounded max)."""

    def __init__(self, clip_tokenizer, t5_tokenizer):
        self.clip_l = SDTokenizer(tokenizer=clip_tokenizer)
        self.clip_g = SDTokenizer(pad_with_end=False,
                                  tokenizer=clip_tokenizer)
        self.t5xxl = SDTokenizer(pad_with_end=False, tokenizer=t5_tokenizer,
                                 has_start_token=False,
                                 pad_to_max_length=False,
                                 max_length=99999999, min_length=77)

    def tokenize_with_weights(self, text: str):
        return {"g": self.clip_g.tokenize_with_weights(text),
                "l": self.clip_l.tokenize_with_weights(text),
                "t5xxl": self.t5xxl.tokenize_with_weights(text)}


class SDClipModel:
    """Layer-selection wrapper over a text transformer
    (other_impls.py:294-372): layer='last' | 'hidden' (layer_idx), optional
    final-LN on the intermediate, projected vs raw pooled output."""

    LAYERS = ("last", "pooled", "hidden")

    def __init__(self, params, cfg, layer="last", layer_idx=None,
                 model_apply=clip_text_apply, num_layers=None,
                 layer_norm_hidden_state=True, return_projected_pooled=True):
        assert layer in self.LAYERS
        self.params, self.cfg = params, cfg
        self.apply = model_apply
        self.num_layers = (num_layers if num_layers is not None
                           else getattr(cfg, "num_hidden_layers",
                                        getattr(cfg, "num_layers", None)))
        self.layer, self.layer_idx = layer, None
        self.layer_norm_hidden_state = layer_norm_hidden_state
        self.return_projected_pooled = return_projected_pooled
        if layer == "hidden":
            assert layer_idx is not None and abs(layer_idx) < self.num_layers
            self.set_clip_options({"layer": layer_idx})

    def set_clip_options(self, options):
        layer_idx = options.get("layer", self.layer_idx)
        self.return_projected_pooled = options.get(
            "projected_pooled", self.return_projected_pooled)
        if layer_idx is None or abs(layer_idx) > self.num_layers:
            self.layer = "last"
        else:
            self.layer, self.layer_idx = "hidden", layer_idx

    def __call__(self, tokens):
        tokens = jnp.asarray(tokens, jnp.int32)
        outputs = self.apply(
            self.params, self.cfg, tokens,
            intermediate_output=self.layer_idx,
            final_layer_norm_intermediate=self.layer_norm_hidden_state)
        z = outputs[0] if self.layer == "last" else outputs[1]
        pooled = None
        if len(outputs) >= 3:
            if (not self.return_projected_pooled and len(outputs) >= 4
                    and outputs[3] is not None):
                pooled = outputs[3].astype(jnp.float32)
            elif outputs[2] is not None:
                pooled = outputs[2].astype(jnp.float32)
        return z.astype(jnp.float32), pooled

    def encode_token_weights(self, token_weight_pairs):
        """other_impls.py:294-304 — weights are carried but unused (1.0)."""
        tokens = [t for t, _ in token_weight_pairs[0]]
        out, pooled = self([tokens])
        first_pooled = pooled[0:1] if pooled is not None else None
        return out[0:1], first_pooled


def sdxl_clip_g(params, cfg, layer="penultimate"):
    """SDXLClipG (other_impls.py:374-389): penultimate hidden layer, no
    final-LN on it."""
    if layer == "penultimate":
        layer, layer_idx = "hidden", -2
    else:
        layer_idx = None
    return SDClipModel(params, cfg, layer=layer, layer_idx=layer_idx,
                       layer_norm_hidden_state=False)


def t5xxl_model(params, cfg: T5Config, layer="last", layer_idx=None):
    """T5XXLModel (other_impls.py:392-409)."""
    return SDClipModel(params, cfg, layer=layer, layer_idx=layer_idx,
                       model_apply=t5_apply, num_layers=cfg.num_layers)
