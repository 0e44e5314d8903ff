"""Filesystem / serialization utilities (ref: mimogpt/utils/io_utils.py and
txt_utils.py — mkdirs, pickle/yaml helpers, recursive file walking)."""

from __future__ import annotations

import os
import pickle

import yaml


def mkdirs(path):
    os.makedirs(path, exist_ok=True)
    return path


def pickle_dump(obj, path):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def pickle_load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def write_to_yaml(obj, path):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def read_from_yaml(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def walk_all_files(root, suffixes=None):
    """Recursively list files, optionally filtered by suffix."""
    out = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if suffixes is None or fn.lower().endswith(tuple(suffixes)):
                out.append(os.path.join(dirpath, fn))
    return sorted(out)


def get_dirs(root):
    return sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)))
