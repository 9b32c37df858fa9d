"""Corpus generator invariants (FIXTURES.md §1): determinism, prefix
property, class mix, ground-truth consistency."""

import collections

import numpy as np

from frizbee_spark.sources import corpus as C


class TestCorpus:
    @classmethod
    def setup_class(cls):
        cls.docs, cls.pairs, cls.clusters = C.generate_corpus(600)

    def test_prefix_property(self):
        small, pairs_small, _ = C.generate_corpus(200)
        assert small.equals(self.docs.slice(0, 200))

    def test_deterministic(self):
        again, _, _ = C.generate_corpus(600)
        assert again.equals(self.docs)

    def test_schema_matches_input_hint(self):
        names = self.docs.schema.names
        assert names == ["url", "warc_ts", "html", "text", "lang"]

    def test_html_roundtrip_byte_identical(self):
        texts = self.docs.column("text").to_pylist()
        htmls = self.docs.column("html").to_pylist()
        for t, h in zip(texts, htmls):
            assert h == b"<html><body>" + t.encode("utf-8") + b"</body></html>"

    def test_unique_urls(self):
        urls = self.docs.column("url").to_pylist()
        assert len(set(urls)) == len(urls)

    def test_class_mix(self):
        n = 600
        cls = collections.Counter(C.class_of(r) for r in range(n))
        assert 0.5 < cls["unique"] / n < 0.7
        assert 0.12 < cls["exact"] / n < 0.28
        assert 0.06 < cls["near"] / n < 0.18

    def test_truth_pairs_reference_lower_ids(self):
        urls = self.docs.column("url").to_pylist()
        order = {u: i for i, u in enumerate(urls)}
        for a, b in zip(self.pairs.column("a_url").to_pylist(),
                        self.pairs.column("b_url").to_pylist()):
            assert order[a] < order[b]

    def test_exact_pairs_are_byte_identical(self):
        urls = self.docs.column("url").to_pylist()
        texts = dict(zip(urls, self.docs.column("text").to_pylist()))
        p = self.pairs.to_pydict()
        for a, b, k in zip(p["a_url"], p["b_url"], p["kind"]):
            if k == "exact":
                assert texts[a] == texts[b]
            elif k == "near":
                assert texts[a] != texts[b]

    def test_span_pairs_share_long_span(self):
        urls = self.docs.column("url").to_pylist()
        texts = dict(zip(urls, self.docs.column("text").to_pylist()))
        p = self.pairs.to_pydict()
        spans = [(a, b) for a, b, k in zip(p["a_url"], p["b_url"], p["kind"]) if k == "span"]
        assert spans
        for a, b in spans:
            # true span is >= ~2000 chars; the sampled detector below is
            # conservative (detects >= ~0.8x), so assert a safe floor
            assert _longest_common_run(texts[a], texts[b]) >= 1200

    def test_clusters_cover_all_docs(self):
        assert self.clusters.num_rows == 600

    def test_cluster_ids_are_member_min(self):
        cl = self.clusters.to_pydict()
        urls = self.docs.column("url").to_pylist()
        order = {u: i for i, u in enumerate(urls)}
        groups = collections.defaultdict(list)
        for u, c in zip(cl["url"], cl["cluster_id"]):
            groups[c].append(u)
        for c, members in groups.items():
            assert c == min(members)
            assert c in members

    def test_zipf_site_skew(self):
        urls = self.docs.column("url").to_pylist()
        sites = collections.Counter(u.split("/")[2] for u in urls)
        top = sites.most_common(1)[0][1]
        assert top > 600 * 0.2  # zipf(1.3): head site dominates


def _longest_common_run(a: str, b: str) -> int:
    """Longest common substring length via suffix sets (test-only, small)."""
    # binary search on length with rolling set of substrings
    lo, hi = 0, min(len(a), len(b))
    while lo < hi:
        mid = (lo + hi + 1) // 2
        subs = {a[i : i + mid] for i in range(0, len(a) - mid + 1, max(mid // 4, 1))}
        # sampled starts on a; check all starts on b
        found = any(b[i : i + mid] in subs for i in range(len(b) - mid + 1))
        if found:
            lo = mid
        else:
            hi = mid - 1
    return lo
