"""Deterministic Common-Crawl-style synthetic corpus (FIXTURES.md §1).

Shape per BASELINE.json input_hint:
    documents(url string, warc_ts timestamp, html binary, text string, lang string)
plus ground-truth tables for recall/cluster-agreement tests:
    truth_pairs(a_url, b_url, kind)     kind in {exact, near, span}
    truth_clusters(url, cluster_id)     CC over exact+near pairs

Determinism rules (mirrors the reference's seeded synthetic benchmark
generator pattern — /root/reference/benches/match_list/generate.rs:48-120:
seeded RNG, controlled match%/partial%/length classes):
- every row is generated from rng(seed, row_id) only, so the first k rows
  of a larger scale are byte-identical to a smaller scale (prefix property);
- class assignment uses a pure hash of row_id (no RNG stream coupling);
- donors are always lower-id rows of class 'unique'.

Classes (FIXTURES.md §1.1): 60% unique, 20% exact dup, 12% near dup
(1-5 word edits), 5% long-shared-span, 3% boilerplate-heavy.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np

from ..functions.hashing import splitmix64

CORPUS_SEED = 42
VOCAB_SIZE = 5000
N_SITES = 500
N_TEMPLATES = 10
TEMPLATE_WORDS = 150
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

CLASS_UNIQUE, CLASS_EXACT, CLASS_NEAR, CLASS_SPAN, CLASS_BOILER = (
    "unique", "exact", "near", "span", "boiler",
)
# cumulative class thresholds over u in [0,1)
_CLASS_EDGES = (0.60, 0.80, 0.92, 0.97)
_FORCED_UNIQUE = 16  # first rows are donor pool


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng([CORPUS_SEED, *key])


def class_of(row_id: int) -> str:
    if row_id < _FORCED_UNIQUE:
        return CLASS_UNIQUE
    u = int(splitmix64(np.uint64(row_id ^ 0xC0FFEE))) / 2**64
    if u < _CLASS_EDGES[0]:
        return CLASS_UNIQUE
    if u < _CLASS_EDGES[1]:
        return CLASS_EXACT
    if u < _CLASS_EDGES[2]:
        return CLASS_NEAR
    if u < _CLASS_EDGES[3]:
        return CLASS_SPAN
    return CLASS_BOILER


def _build_vocab() -> list[str]:
    rng = _rng(10**9)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words, seen = [], set()
    while len(words) < VOCAB_SIZE:
        ln = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=ln))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _build_templates() -> list[np.ndarray]:
    return [
        _rng(2 * 10**9, t).integers(0, VOCAB_SIZE, size=TEMPLATE_WORDS)
        for t in range(N_TEMPLATES)
    ]


def _unique_nw(row_id: int) -> int:
    """Word count a unique-class row will have (first RNG draw only)."""
    rng = _rng(row_id)
    chars = float(np.clip(rng.lognormal(np.log(2000.0), 0.7), 200, 20000))
    return max(int(chars // 7), 24)


def _donor_for(row_id: int, rng: np.random.Generator, min_words: int = 0) -> int:
    """A lower-id row of class 'unique' (re-draw, then linear fallback)."""
    for _ in range(64):
        d = int(rng.integers(0, row_id))
        if class_of(d) == CLASS_UNIQUE and _unique_nw(d) >= min_words:
            return d
    d = row_id - 1
    while d >= 0 and not (class_of(d) == CLASS_UNIQUE and _unique_nw(d) >= min_words):
        d -= 1
    if d < 0:  # no long-enough donor exists yet: relax the length bound
        d = row_id - 1
        while class_of(d) != CLASS_UNIQUE:
            d -= 1
    return d


def _unique_words(rng: np.random.Generator) -> np.ndarray:
    chars = float(np.clip(rng.lognormal(np.log(2000.0), 0.7), 200, 20000))
    nw = max(int(chars // 7), 24)
    return rng.integers(0, VOCAB_SIZE, size=nw)


class CorpusGenerator:
    """Generates word-index arrays per row; text realized lazily via vocab."""

    def __init__(self) -> None:
        self.vocab = np.array(_build_vocab())
        self.templates = _build_templates()
        self._words_cache: dict[int, np.ndarray] = {}

    def words_of(self, row_id: int) -> tuple[np.ndarray, int | None, str]:
        """Returns (word_ids, donor_row_or_None, class)."""
        cls = class_of(row_id)
        rng = _rng(row_id)
        if cls == CLASS_UNIQUE:
            return _unique_words(rng), None, cls
        if cls == CLASS_EXACT:
            donor = _donor_for(row_id, rng)
            return self._donor_words(donor), donor, cls
        if cls == CLASS_NEAR:
            donor = _donor_for(row_id, rng)
            w = self._donor_words(donor).copy()
            k = int(rng.integers(1, 6))
            for _ in range(k):
                op = int(rng.integers(0, 3))
                pos = int(rng.integers(0, len(w)))
                if op == 0:  # substitute
                    w[pos] = int(rng.integers(0, VOCAB_SIZE))
                elif op == 1 and len(w) > 25:  # delete
                    w = np.delete(w, pos)
                else:  # insert
                    w = np.insert(w, pos, int(rng.integers(0, VOCAB_SIZE)))
            return w, donor, cls
        if cls == CLASS_SPAN:
            # donor must be long enough that the copied span is a real
            # "long exact span" (>= ~2000 chars, FIXTURES.md §1.1)
            donor = _donor_for(row_id, rng, min_words=300)
            dw = self._donor_words(donor)
            span_nw = min(len(dw), max(300, len(dw) // 2))  # >= ~2000 chars
            s0 = int(rng.integers(0, max(len(dw) - span_nw, 0) + 1))
            span = dw[s0 : s0 + span_nw]
            pre = rng.integers(0, VOCAB_SIZE, size=max(len(dw) // 3, 20))
            suf = rng.integers(0, VOCAB_SIZE, size=max(len(dw) // 3, 20))
            return np.concatenate([pre, span, suf]), donor, cls
        # boilerplate: one of N_TEMPLATES templates + 20% random insertions
        t = int(rng.integers(0, N_TEMPLATES))
        base = self.templates[t]
        n_ins = max(len(base) // 5, 1)
        ins_pos = np.sort(rng.integers(0, len(base) + 1, size=n_ins))
        ins_words = rng.integers(0, VOCAB_SIZE, size=n_ins)
        return np.insert(base, ins_pos, ins_words), None, cls

    def _donor_words(self, donor: int) -> np.ndarray:
        w = self._words_cache.get(donor)
        if w is None:
            w = _unique_words(_rng(donor))
            self._words_cache[donor] = w
        return w

    def text_of(self, word_ids: np.ndarray) -> str:
        return " ".join(self.vocab[word_ids])


def _url_of(row_id: int, rng: np.random.Generator) -> str:
    site = (int(rng.zipf(1.3)) - 1) % N_SITES
    # full 64-bit path hash: a 32-bit truncation has expected-collision ~1
    # at 100k rows on one zipf-hot site, and a url collision collides
    # doc_ids (pipeline fails loudly on that invariant)
    path = int(splitmix64(np.uint64(row_id ^ 0xBADC0DE)))
    return f"https://site{site:04d}.example/{path:016x}"


def _lang_of(row_id: int) -> str:
    m = row_id % 100
    return "en" if m < 90 else ("de" if m < 96 else "fr")


def _ts_of(row_id: int) -> int:
    """Epoch seconds, deterministic per row (FIXTURES.md §1)."""
    return int(EPOCH.timestamp()) + (row_id * 37 % 86400) * 90


def generate_corpus(n_rows: int):
    """Returns (documents, truth_pairs, truth_clusters) as pyarrow Tables."""
    import pyarrow as pa

    gen = CorpusGenerator()
    urls, texts, langs, tss, htmls = [], [], [], [], []
    pairs_a, pairs_b, pairs_kind = [], [], []
    url_of_row: list[str] = []

    for r in range(n_rows):
        rng = _rng(r, 7)
        w, donor, cls = gen.words_of(r)
        text = gen.text_of(w)
        url = _url_of(r, rng)
        url_of_row.append(url)
        urls.append(url)
        texts.append(text)
        langs.append(_lang_of(r))
        tss.append(_ts_of(r))
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        if donor is not None and donor < n_rows:
            pairs_a.append(url_of_row[donor])
            pairs_b.append(url)
            pairs_kind.append(cls)

    documents = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("s", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth_pairs = pa.table(
        {
            "a_url": pa.array(pairs_a, pa.string()),
            "b_url": pa.array(pairs_b, pa.string()),
            "kind": pa.array(pairs_kind, pa.string()),
        }
    )
    truth_clusters = _clusters_table(url_of_row, pairs_a, pairs_b, pairs_kind)
    return documents, truth_pairs, truth_clusters


def _clusters_table(urls: list[str], pa_: list[str], pb: list[str], kinds: list[str]):
    """Union-find over exact+near pairs; cluster id = lexicographic min url."""
    import pyarrow as pa

    parent: dict[str, str] = {u: u for u in urls}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, k in zip(pa_, pb, kinds):
        if k == CLASS_SPAN:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "cluster_id": pa.array([find(u) for u in urls], pa.string()),
        }
    )


def write_corpus(out_dir: str, n_rows: int, overwrite: bool = False) -> str:
    """Materialize the corpus as parquet; cached by (dir, n_rows) marker."""
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, f"_GENERATED_{n_rows}")
    if os.path.exists(marker) and not overwrite:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs, pairs, clusters = generate_corpus(n_rows)
    # small row groups keep the file splittable across Spark input tasks
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=2048)
    pq.write_table(pairs, os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(clusters, os.path.join(out_dir, "truth_clusters.parquet"))
    open(marker, "w").close()
    return out_dir
