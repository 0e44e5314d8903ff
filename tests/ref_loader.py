"""Import the untouched reference (at /root/reference) for golden-output tests.

The reference depends on ``timm`` and a ``mimogpt.utils`` mono-repo package
that are not installed here; we register minimal stand-ins in ``sys.modules``
before importing it. The stubs reimplement only the public API surface the
reference touches (timm's Mlp/Attention/PatchEmbed and a logger/Registry) —
they are test fixtures, not part of the framework.

Reference model code itself is executed unmodified, so tests compare the TPU
build against the genuine PyTorch behaviour.
"""

from __future__ import annotations

import logging
import sys
import types

_REF_PATH = "/root/reference"


def _install_stubs():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # The reference hard-codes .cuda() on tensors/modules (e.g. mmdit.py:1042,
    # rectified_flow.py:67, models_ours.py:329) and relies on Ascend
    # monkey-patching; make those no-ops so it runs on CPU for golden tests.
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self

    if "timm" in sys.modules:
        return

    class Mlp(nn.Module):
        # timm.layers.Mlp API subset used by the reference blocks
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, bias=True, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        # timm.models.vision_transformer.Attention API subset
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                     attn_drop=0.0, proj_drop=0.0, norm_layer=nn.LayerNorm):
            super().__init__()
            assert dim % num_heads == 0
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.q_norm = norm_layer(self.head_dim) if qk_norm else nn.Identity()
            self.k_norm = norm_layer(self.head_dim) if qk_norm else nn.Identity()
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            q, k = self.q_norm(q), self.k_norm(k)
            x = F.scaled_dot_product_attention(q, k, v)
            x = x.transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class PatchEmbed(nn.Module):
        # timm.layers.PatchEmbed API subset
        def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
                     bias=True, flatten=True, **kwargs):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.img_size = (img_size, img_size) if img_size is not None else None
            if self.img_size is not None:
                self.grid_size = tuple(s // p for s, p in zip(self.img_size, self.patch_size))
                self.num_patches = self.grid_size[0] * self.grid_size[1]
            else:
                self.num_patches = None
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return x

    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    timm = _mod("timm")
    timm_models = _mod("timm.models")
    timm_vit = _mod("timm.models.vision_transformer")
    timm_vit.Mlp = Mlp
    timm_vit.Attention = Attention
    timm_vit.PatchEmbed = PatchEmbed
    timm.models = timm_models
    timm_models.vision_transformer = timm_vit
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.vision_transformer"] = timm_vit

    # mimogpt.utils stub: logger + Registry (real one drags in decord/moxing)
    utils = _mod("mimogpt.utils")
    utils.hf_logger = logging.getLogger("ref")

    class Registry(dict):
        def __init__(self, name):
            super().__init__()
            self._name = name

        def register(self, fn=None, name=None):
            def deco(f):
                self[name or f.__name__] = f
                return f
            return deco(fn) if fn is not None else deco

        def get(self, key):
            return self[key]

    utils.Registry = Registry
    sys.modules["mimogpt.utils"] = utils


def load_reference():
    """Returns the imported reference `mimogpt.models.selftok` namespace modules."""
    _install_stubs()
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    import importlib

    mods = types.SimpleNamespace()
    mods.diti_utils = importlib.import_module("mimogpt.models.selftok.diti_utils")
    mods.modules = importlib.import_module("mimogpt.models.selftok.modules")
    mods.models_ours = importlib.import_module("mimogpt.models.selftok.models_ours")
    mods.vq = importlib.import_module("mimogpt.models.selftok.vector_quantize_pytorch")
    mods.quantizer = importlib.import_module("mimogpt.models.selftok.quantizer")
    mods.mmdit = importlib.import_module("mimogpt.models.selftok.sd3.mmdit")
    mods.rectified_flow = importlib.import_module("mimogpt.models.selftok.sd3.rectified_flow")
    mods.sd3_impls = importlib.import_module("mimogpt.models.selftok.sd3.sd3_impls")
    mods.model_zoo = importlib.import_module("mimogpt.models.selftok.model_zoo")
    mods.image_tokenizer = importlib.import_module("mimogpt.models.selftok.image_tokenizer")
    mods.image_renderer = importlib.import_module("mimogpt.models.selftok.image_renderer")
    return mods


_CACHE = None


def get_ref():
    global _CACHE
    if _CACHE is None:
        _CACHE = load_reference()
    return _CACHE


def enliven_zero_init(m, std=0.05, seed=1234):
    """Randomize every all-zero *parameter* of a reference torch module.

    The reference zero-inits each DismantledBlock's adaLN stack
    (sd3/mmdit.py:431-432; DiT final layers likewise), which makes a
    freshly-constructed trunk an identity map: gates are 0, so attention,
    MLP, modulation and mask plumbing contribute nothing to the output and
    a golden comparison would never exercise them (verified: perturbing a
    qkv weight leaves the forward bit-identical). Both frameworks consume
    the same state dict, so parity holds for ANY weights — giving the zero
    parameters small random values turns the goldens into live-trunk
    comparisons. Buffers are left untouched."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            if p.numel() and not bool(p.detach().abs().max() > 0):
                p.copy_(torch.randn(p.shape, generator=g) * std)
    return m
