"""Config system: YAML -> attribute-access dict, schema-compatible with the
reference's ``common / model / tokenizer.params`` layout
(ref: mimogpt/infer/infer_utils.py:12-19,165-168 and configs/res256/256-eval.yml).

The reference uses ``easydict.EasyDict``; we provide a small self-contained
equivalent so the YAML configs shipped with the reference parse unchanged.
"""

from __future__ import annotations

import copy
import yaml


class AttrDict(dict):
    """A dict with attribute access, recursively wrapping nested dicts.

    Equivalent in behaviour to ``easydict.EasyDict`` for the subset the
    reference configs exercise (nested mappings, lists of mappings).
    """

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, AttrDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __setitem__(self, key, value):
        # wrap on EVERY write path (easydict aliases __setitem__ to the
        # wrapping __setattr__): cfg["x"] = {...} and merge_overrides must
        # yield attribute-accessible nodes, not plain dicts
        super().__setitem__(key, self._wrap(value))

    def update(self, *args, **kwargs):
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self):
        out = {}
        for k, v in self.items():
            if isinstance(v, AttrDict):
                v = v.to_dict()
            elif isinstance(v, (list, tuple)):
                v = type(v)(x.to_dict() if isinstance(x, AttrDict) else x for x in v)
            out[k] = v
        return out


def none_str(v):
    """YAML 'None' strings -> real None: the reference configs spell None as
    a bare `None`, which YAML parses as the string 'None'."""
    return None if v in (None, "None", "") else v


def load_config(path: str) -> AttrDict:
    """Parse a YAML config file (ref: infer_utils.py:165-168 parse_args_from_yaml)."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return AttrDict(raw)


def merge_overrides(cfg: AttrDict, overrides: dict) -> AttrDict:
    """Apply dotted-key overrides, e.g. {"tokenizer.params.k": 1024}."""
    cfg = AttrDict(copy.deepcopy(cfg))
    for key, value in overrides.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return cfg
