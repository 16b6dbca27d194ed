"""In-memory n-gram LM with MLE / Laplace / Stupid-Backoff / Kneser-Ney
scoring, parity-ported from the reference model classes:

- count tables          — ``GenerateNgramIndex`` pipeline output shape
- MLE                   — ``lucenebased/CountingStringLM.getNgramLogProbability``
- Laplace               — ``mapbased/LaplaceSmoothedLM``
- Stupid Backoff        — ``lucenebased/StupidBackoffLM.score`` (incl. its
                          early-return quirks)
- Kneser-Ney            — ``lucenebased/KneserNeyLM.kn`` (incl. discount
                          auto-estimation fixups, punk handling, and the
                          pruned-count reset branches)

This object is intentionally plain-Python + dicts: it is built once on the
driver (from Spark-aggregated counts or directly from text for tests) and
broadcast to executors, where Arrow-batched UDFs do dictionary lookups.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from topicrawler_spark.lm.ngrams import UNKNOWN_WORD, ngram_sequence, provider_tokenize
from topicrawler_spark.seg.sentences import provider_sentences

_LOG10 = math.log(10)


def _join(ngram: list[str]) -> str:
    return " ".join(ngram)


@dataclass
class LocalLM:
    order: int
    counts: dict[str, int] = field(default_factory=dict)
    nf: dict[str, tuple[int, int, int]] = field(default_factory=dict)  # (N1,N2,N3p)
    np_: dict[str, tuple[int, int, int]] = field(default_factory=dict)
    nfp: dict[str, tuple[int, int, int]] = field(default_factory=dict)
    N: list[list[int]] = field(default_factory=list)  # N[n][0..5]
    S: list[int] = field(default_factory=list)
    vocab: set[str] = field(default_factory=set)

    # ------------------------------------------------------------------ build

    @staticmethod
    def from_token_sequences(
        sequences: list[list[str]], order: int, mincount: int = 1, boundary_mode: int = 0
    ) -> "LocalLM":
        """Build the full count-table family from tokenized sentences, the
        same recipe as the reference counting pipeline (orders 1..order)."""
        counts: Counter[str] = Counter()
        for tokens in sequences:
            if not tokens:
                continue
            for n in range(1, order + 1):
                for ng in ngram_sequence(tokens, n, boundary_mode):
                    counts[_join(ng)] += 1
        if mincount > 1:
            counts = Counter({k: v for k, v in counts.items() if v >= mincount})
        return LocalLM.from_counts(dict(counts), order)

    @staticmethod
    def from_texts(
        texts: list[str], order: int, mincount: int = 1, language_code: str = "default"
    ) -> "LocalLM":
        seqs: list[list[str]] = []
        for text in texts:
            for sentence in provider_sentences(text, language_code):
                tokens = provider_tokenize(sentence)
                if tokens:
                    seqs.append(tokens)
        return LocalLM.from_token_sequences(seqs, order, mincount)

    @staticmethod
    def from_counts(counts: dict[str, int], order: int) -> "LocalLM":
        """Derive continuation counts, histograms and vocab from a count table
        (mirrors the nfollow/nprecede/nfollowerprecede reducers + the
        ``__sum_ngrams__`` histogram writer)."""
        lm = LocalLM(order=order, counts=counts)
        nf: dict[str, list[int]] = {}
        np_: dict[str, list[int]] = {}
        nfp: dict[str, list[int]] = {}

        def bump(d: dict[str, list[int]], key: str, c: int) -> None:
            e = d.get(key)
            if e is None:
                e = [0, 0, 0]
                d[key] = e
            if c == 1:
                e[0] += 1
            elif c == 2:
                e[1] += 1
            else:
                e[2] += 1

        max_n = order
        N = [[0] * 6 for _ in range(max_n + 2)]
        S = [0] * (max_n + 2)
        for g, c in counts.items():
            parts = g.split(" ")
            n = len(parts)
            if n > max_n:
                max_n = n
                N.extend([[0] * 6 for _ in range(n - len(N) + 1)])
                S.extend([0] * (n - len(S) + 1))
            if n > 1:
                bump(nf, _join(parts[:-1]), c)
                bump(np_, _join(parts[1:]), c)
            if n > 2:
                bump(nfp, _join(parts[1:-1]), c)
            cls = c if c <= 4 else 5
            N[n][cls] += 1
            N[n][0] += 1
            S[n] += c
        lm.nf = {k: tuple(v) for k, v in nf.items()}
        lm.np_ = {k: tuple(v) for k, v in np_.items()}
        lm.nfp = {k: tuple(v) for k, v in nfp.items()}
        lm.N = N
        lm.S = S
        lm.vocab = {g for g in counts if " " not in g}
        lm._finalize()
        return lm

    def _finalize(self) -> None:
        # num_ngrams[n] = [distinct, N1, N2, N3plus]
        self.num_ngrams = [
            [row[0], row[1], row[2], row[3] + row[4] + row[5]] for row in self.N
        ]

    # ----------------------------------------------------------------- lookups

    def count(self, g: str) -> int:
        return self.counts.get(g, 0)

    def _cont(self, d: dict, g: str) -> int:
        e = d.get(g)
        if e is None or g not in self.counts:
            # the reference stores continuation counts on the ngram's own
            # index row; a pruned/absent ngram answers zero
            return 0
        return e[0] + e[1] + e[2]

    def nf_total(self, g: str) -> int:
        return self._cont(self.nf, g)

    def np_total(self, g: str) -> int:
        return self._cont(self.np_, g)

    def nfp_total(self, g: str) -> int:
        return self._cont(self.nfp, g)

    def ends_with_oov(self, ngram: list[str]) -> bool:
        return not ngram or ngram[-1] not in self.vocab

    def contains_oov(self, ngram: list[str]) -> bool:
        return any(w not in self.vocab for w in ngram)

    # ----------------------------------------------------------------- scorers

    def mle_log10(self, ngram: list[str]) -> float:
        """CountingStringLM MLE: log10 c(ngram) - log10 c(hist); unigrams are
        normalized by the number of *distinct* unigrams (reference quirk)."""
        if not ngram:
            return float("-inf")
        nom = self.count(_join(ngram))
        if nom == 0:
            return float("-inf")
        if len(ngram) == 1:
            return math.log10(nom) - math.log10(self.num_ngrams[1][0])
        denom = self.count(_join(ngram[:-1]))
        if denom == 0:
            return float("-inf")
        return math.log10(nom) - math.log10(denom)

    def laplace_log10(self, ngram: list[str]) -> float:
        V = len(self.vocab)
        nom = self.count(_join(ngram)) + 1
        if len(ngram) == 1:
            return math.log10(nom) - math.log10(self.S[1] + V)
        denom = self.count(_join(ngram[:-1])) + V
        return math.log10(nom) - math.log10(denom)

    # --- Stupid Backoff ------------------------------------------------------

    def sb_params(self, discount: float = 0.4) -> tuple[float, float]:
        up = 1.0 / (self.num_ngrams[1][0] + 1)
        return up, up * discount

    def stupid_backoff_log10(self, ngram: list[str], discount: float = 0.4) -> float:
        return math.log10(self.stupid_backoff(ngram, discount))

    def stupid_backoff(self, ngram: list[str], discount: float = 0.4) -> float:
        _, ud = self.sb_params(discount)
        n = len(ngram)
        if n < 1 or self.ends_with_oov(ngram):
            return ud
        # unigram
        sub = ngram[n - 1 :]
        nom = self.count(_join(sub))
        denom = self.num_ngrams[1][0]
        if nom == 0 or denom == 0:
            return ud
        s = nom / denom
        if len(sub) == n:
            return s
        # middle orders
        for i in range(2, min(n, self.order)):
            ls = s
            sub = ngram[n - i : n]
            hist = ngram[n - i : n - 1]
            nom = self.count(_join(sub))
            denom = self.count(_join(hist))
            if nom == 0 or denom == 0:
                if len(sub) < self.order:
                    s = ls * discount
                return s
            s = nom / denom
        if n < self.order:
            return s
        # top order
        sub = ngram[n - self.order : n]
        hist = ngram[n - self.order : n - 1]
        nom = self.count(_join(sub))
        denom = self.count(_join(hist))
        if nom == 0 or denom == 0:
            return s
        return nom / denom

    # --- Kneser-Ney -----------------------------------------------------------

    def kn_discounts(self, discount: float = -1.0) -> list[float]:
        """Per-order discounts; auto-estimated D = N1/(N1+2*N2) with the
        reference's monotonicity fix-ups unless an explicit 0<=d<=1 given."""
        D = [0.7] * (self.order + 1)
        if 0 <= discount <= 1:
            return [discount] * (self.order + 1)
        for n in range(1, self.order + 1):
            N = list(self.N[n])
            for i in range(len(N) - 1, 1, -1):
                if N[i] == 0:
                    N[i] = 1
                if i * N[i] >= (i - 1) * N[i - 1]:
                    N[i - 1] = N[i] * i + 1
            D[n] = N[1] / (N[1] + 2.0 * N[2])
        return D

    def kn_setup(self, discount: float = -1.0, unk_log10: float = float("nan")):
        D = self.kn_discounts(discount)
        if math.isfinite(unk_log10):
            return D, 10.0 ** unk_log10, True, float("nan"), float("nan")
        up_log = -math.log(self.num_ngrams[2][0]) if self.num_ngrams[2][0] > 0 else float("-inf")
        uw_log = (
            math.log(D[1]) - math.log(self.num_ngrams[1][0])
            if self.num_ngrams[1][0] > 0
            else float("-inf")
        )
        ud = math.exp(up_log + uw_log)
        return D, ud, False, up_log, uw_log

    def kneser_ney_log10(
        self, ngram: list[str], discount: float = -1.0, unk_log10: float = float("nan")
    ) -> float:
        return math.log10(self.kneser_ney(ngram, discount, unk_log10))

    def kneser_ney(
        self, ngram: list[str], discount: float = -1.0, unk_log10: float = float("nan")
    ) -> float:
        D, ud, static_punk, up_log, uw_log = self.kn_setup(discount, unk_log10)
        punk = self._punk(ngram, ud, static_punk, uw_log)
        prob = self._kn(ngram, punk, D)
        if math.isnan(prob):
            return ud
        if prob > 1.0:
            return 1.0
        if prob < punk:
            return punk
        return prob

    def _punk(self, ngram: list[str], ud: float, static_punk: bool, uw_log: float) -> float:
        if static_punk or len(ngram) < 2:
            return ud
        bigram_hist = ngram[-2:-1]
        nom = self.nf_total(_join(bigram_hist))
        if nom == 0:
            return ud
        up = math.log(nom) - math.log(self.num_ngrams[2][0])
        return math.exp(up + uw_log)

    def _kn(self, ngram: list[str], punk: float, D: list[float]) -> float:
        """Interpolated modified KN over the joined count table; a direct
        re-expression of the reference recursion incl. its pruning resets."""
        n = len(ngram)
        if n < 1 or self.ends_with_oov(ngram):
            return punk
        log = math.log
        exp = math.exp

        # unigram continuation probability
        sub = ngram[n - 1 :]
        nom = self.np_total(_join(sub))
        denom = self.num_ngrams[2][0]
        if nom == 0:
            c = self.count(_join(sub))
            if c == 0:
                return exp(-log(self.num_ngrams[1][0]))  # 1 / #unigrams
            return exp(log(c) - log(self.S[1]))  # c(w) / sum unigrams
        pkn = exp(log(nom) - log(denom))

        lp = 0.0
        nfh_prev = 0.0
        hist_prev: str | None = None
        ch = 0.0
        sub_str = _join(sub)
        for i in range(2, min(n, self.order)):
            hist = _join(ngram[n - i : n - 1])
            nfph = self.nfp_total(hist)
            nfh = self.nf_total(hist)
            nph = self.np_total(hist)
            nfph = max(nfh, nph, nfph)
            if nfph == 0:
                if ch != 0 and lp != 0 and nfh_prev != 0 and hist_prev is not None:
                    nom = self.count(sub_str)
                    denom_log = log(ch)
                    nom = max(nom - D[i], 0.0)
                    p = exp(log(nom) - denom_log) if nom != 0 else 0.0
                    lw = (log(D[i]) - denom_log) + log(nfh_prev)
                    pkn = p + exp(lw + log(lp))
                return pkn
            denom_log = log(nfph)
            sub_str = _join(ngram[n - i : n])
            nom = self.np_total(sub_str)
            ch = self.count(hist)
            if nfh == 0:
                nfh = 1  # pruning artifact reset (reference HACK)
            lp = pkn
            lw = (log(D[i]) - denom_log) + log(nfh)
            nom = max(nom - D[i], 0.0)
            p = exp(log(nom) - denom_log) if nom != 0 else 0.0
            pkn = p + exp(lw + log(lp))
            if nom == 0:
                return pkn
            nfh_prev = nfh
            hist_prev = hist

        # top order
        hist = _join(ngram[max(0, n - self.order) : n - 1])
        ch = self.count(hist)
        if ch == 0:
            if hist_prev is not None and lp != 0 and nfh_prev != 0:
                ch = self.count(hist_prev)
                if ch != 0:
                    nom = self.count(sub_str)
                    denom_log = log(ch)
                    nom = max(nom - D[n], 0.0)
                    p = exp(log(nom) - denom_log) if nom != 0 else 0.0
                    lw = (log(D[n]) - denom_log) + log(nfh_prev)
                    pkn = p + exp(lw + log(lp))
            return pkn
        sub_str = _join(ngram[max(0, n - self.order) : n])
        nom = self.count(sub_str)
        denom_log = log(ch)
        nfh = self.nf_total(hist)
        if nfh == 0:
            nfh = 1
        lp = pkn
        nom = max(nom - D[n], 0.0)
        p = exp(log(nom) - denom_log) if nom != 0 else 0.0
        lw = (log(D[n]) - denom_log) + log(nfh)
        pkn = p + exp(lw + log(lp))
        return pkn

    # ------------------------------------------------------------- convenience

    def scorer(self, kind: str = "kneser-ney", **kw):
        """log10-probability function for the chosen smoothing."""
        if kind in ("mle", "counting"):
            return self.mle_log10
        if kind == "laplace":
            return self.laplace_log10
        if kind in ("sb", "stupid-backoff"):
            return lambda g: self.stupid_backoff_log10(g, **kw) if kw else self.stupid_backoff_log10(g)
        if kind in ("kn", "kneser-ney"):
            if kw:
                return lambda g: self.kneser_ney_log10(g, **kw)
            # precompute setup once for the hot path
            D, ud, static_punk, up_log, uw_log = self.kn_setup()

            def score(g: list[str]) -> float:
                punk = self._punk(g, ud, static_punk, uw_log)
                prob = self._kn(g, punk, D)
                if math.isnan(prob):
                    prob = ud
                elif prob > 1.0:
                    prob = 1.0
                elif prob < punk:
                    prob = punk
                return math.log10(prob)

            return score
        raise ValueError(f"unknown scorer kind: {kind}")

    def unk_ngram(self) -> list[str]:
        return [UNKNOWN_WORD] * self.order
