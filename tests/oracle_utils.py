"""In-memory oracle implementing the reference decision semantics.

Naive all-pairs, mirroring the reference's O(n²) structure
(``/root/reference/create_silver_label.py:352-382``): exact Jaccard on
the same shingle config >= t, SimHash Hamming <= h on the same audio
signature config, transitive closure via networkx. The Spark pipeline
is graded against this (dup-pair recall >= 0.99, FIXTURES.md §1).
"""

from __future__ import annotations

import re
from itertools import combinations

import networkx as nx
import numpy as np
import pandas as pd

from sems_event_deduplication_spark.conf import DedupConfig
from sems_event_deduplication_spark.functions.audio import (
    _projection,
    decode_pcm,
    pack_bits_to_words,
    spectral_fingerprint,
)

NBSP = "\u00a0"


def normalize_py(s: str) -> str:
    """Python mirror of functions.text.normalize_text."""
    s = s.lower()
    parts = [p.strip() for p in s.split("|")]
    best = ""
    for p in parts:
        if len(p) > len(best):
            best = p
    s = best.replace(NBSP, " ")
    s = re.sub(r"[^a-z0-9 ]", " ", s)
    s = re.sub(r" +", " ", s)
    return s.strip()


def shingle_set_py(s: str, k: int) -> frozenset[str]:
    if not s:
        return frozenset()
    if len(s) < k:
        return frozenset([s])
    return frozenset(s[i : i + k] for i in range(len(s) - k + 1))


def jaccard_py(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash_py(buf: bytes, codec: str, cfg: DedupConfig) -> tuple[int, ...]:
    proj = _projection(cfg.n_mel_bands, cfg.simhash_bits, cfg.seed)
    fp = spectral_fingerprint(
        decode_pcm(buf, codec), cfg.fft_frame, cfg.fft_hop, cfg.n_mel_bands,
        cfg.fp_floor_db,
    )
    return tuple(pack_bits_to_words((proj @ fp) > 0, cfg.simhash_bits))


def hamming_py(a, b) -> int:
    return sum(bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(a, b))


def oracle_components(
    pdf: pd.DataFrame, cfg: DedupConfig, with_audio: bool = True
) -> dict[str, str]:
    """clip_id -> component (min member id), reference decision semantics."""
    ids = pdf["clip_id"].tolist()
    norms = [normalize_py(t) for t in pdf["transcript"]]
    sets = [shingle_set_py(n, cfg.shingle_k) for n in norms]
    if with_audio:
        sims = [simhash_py(bytes(buf), codec, cfg)
                for buf, codec in zip(pdf["bytes"], pdf["codec"])]

    g = nx.Graph()
    g.add_nodes_from(ids)
    n = len(ids)
    for i, j in combinations(range(n), 2):
        if jaccard_py(sets[i], sets[j]) >= cfg.jaccard_threshold:
            g.add_edge(ids[i], ids[j])
        elif with_audio and hamming_py(sims[i], sims[j]) <= cfg.hamming_threshold:
            g.add_edge(ids[i], ids[j])
    out = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for node in comp:
            out[node] = root
    return out


def intra_pairs(assign: dict[str, str]) -> set[tuple[str, str]]:
    """All unordered same-component pairs from an assignment map."""
    by_comp: dict[str, list[str]] = {}
    for node, comp in assign.items():
        by_comp.setdefault(comp, []).append(node)
    pairs = set()
    for members in by_comp.values():
        members.sort()
        for a, b in combinations(members, 2):
            pairs.add((a, b))
    return pairs
