"""Broadcast-gazetteer mention detection (Aho-Corasick).

Mirrors the reference's flashgeotext city/country extraction
(/root/reference/scripts/processing/ground_truth_project_detail_formatter.py:47-49,170-171):
a dictionary of known surface forms is scanned over free text in one pass.
The reference calls a per-row library; here the automaton is built once per
Python worker from a broadcast dictionary and applied to whole Arrow batches
(SURVEY.md §2.7 'candidate entity linking'), so the cost is
O(text + matches) per batch regardless of dictionary size — the property that
makes a 10^6-term gazetteer viable at corpus scale where a regex alternation
would not be.

Match semantics are regex-\\b-compatible on lowercased text (word chars =
[a-z0-9_]), so a DuckDB oracle can verify counts exactly.
"""

from __future__ import annotations

from collections import deque

_WORD = set("abcdefghijklmnopqrstuvwxyz0123456789_")


class AhoCorasick:
    """Minimal deterministic Aho-Corasick automaton over lowercase terms."""

    def __init__(self, terms: list[str]):
        # nodes: dict char -> next state; goto[0] is the root
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        self.fail: list[int] = [0]
        for term in sorted(set(terms)):
            t = term.lower()
            if not t:
                continue
            s = 0
            for ch in t:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(t)
        # BFS failure links
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, nxt in self.goto[s].items():
                q.append(nxt)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt].extend(self.out[self.fail[nxt]])

    def scan(self, text: str) -> list[tuple[int, str]]:
        """All (start_offset, term) occurrences in lower(text) whose ends are
        word-boundary-delimited (regex \\b semantics), counted NON-overlapping
        per term exactly like re.finditer: a self-overlapping term (e.g.
        'a b a' in 'a b a b a') yields one match, not two — the T10 oracle
        (regexp_extract_all) and the AC==regex property test count this way,
        and without the suppression the two diverge on such terms."""
        low = text.lower()
        n = len(low)
        hits: list[tuple[int, str]] = []
        last_end: dict[str, int] = {}
        s = 0
        for i, ch in enumerate(low):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for term in self.out[s]:
                start = i - len(term) + 1
                # regex \b: a boundary exists iff EXACTLY ONE side is a word
                # char. The edge-char-conditioned form matters for terms with
                # punctuation edges ('washington d.c.'): \b after a non-word
                # edge requires the NEXT char to be a word char, the inverse
                # of the word-edged case (string edges count as non-word).
                if ((start > 0 and low[start - 1] in _WORD)
                        == (term[0] in _WORD)):
                    continue
                if ((i + 1 < n and low[i + 1] in _WORD)
                        == (term[-1] in _WORD)):
                    continue
                if start < last_end.get(term, 0):
                    continue  # overlaps this term's previous accepted match
                last_end[term] = i + 1
                hits.append((start, term))
        return hits

    def counts(self, text: str) -> dict[str, int]:
        out: dict[str, int] = {}
        for _, term in self.scan(text):
            out[term] = out.get(term, 0) + 1
        return out


_AUTOMATA: dict[tuple[str, ...], AhoCorasick] = {}


def automaton(terms: tuple[str, ...] | list[str]) -> AhoCorasick:
    """Per-process automaton cache: built once per worker per dictionary."""
    key = tuple(sorted({t.lower() for t in terms}))
    ac = _AUTOMATA.get(key)
    if ac is None:
        ac = _AUTOMATA[key] = AhoCorasick(list(key))
    return ac


def spark_scan(df, id_col: str, text_col: str, gazetteer: dict[str, str]):
    """(id, text) -> (id, entity, kind, n_hits): broadcast-dictionary scan.

    ``gazetteer`` maps lowercase surface form -> kind. The dict rides the UDF
    closure (Spark broadcasts task binaries; an explicit sc.broadcast would be
    used for multi-MB dictionaries — same mechanics); the automaton is built
    once per worker via the module cache, then each Arrow batch is scanned
    row-locally. Narrow output, no shuffle.
    """
    import pandas as pd

    terms = tuple(sorted(gazetteer))
    kinds = {t.lower(): gazetteer[t] for t in gazetteer}

    def gen(batches):
        ac = automaton(terms)
        for pdf in batches:
            ids, ents, kds, ns = [], [], [], []
            for key, text in zip(pdf[id_col], pdf[text_col]):
                for term, n in sorted(ac.counts(text or "").items()):
                    ids.append(key)
                    ents.append(term)
                    kds.append(kinds[term])
                    ns.append(n)
            yield pd.DataFrame({id_col: ids, "entity": ents, "kind": kds, "n_hits": ns})

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, entity string, kind string, n_hits long"
    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)
