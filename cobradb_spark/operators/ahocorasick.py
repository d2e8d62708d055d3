"""Aho-Corasick multi-pattern string matching (the 1975 automaton,
built from the published construction: goto trie + BFS failure links +
merged output sets).

This is the dictionary-matching kernel a training-data pipeline runs for
PII lexicons, brand-safety word lists, and blocklist screening: ONE pass
over each document finds all occurrences of ALL patterns simultaneously
— O(text + matches) regardless of dictionary size — where per-pattern
scanning would cost O(text * patterns).  The automaton is built once on
the driver (dictionaries are small), ships inside the task closure, and
scans Arrow batches executor-side.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    def __init__(self, patterns: list[str]):
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns")
        self.patterns = patterns
        # trie: list of dict[char -> state]; output: pattern ids ending here
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        for pid, pat in enumerate(patterns):
            if not pat:
                raise ValueError("empty pattern")
            s = 0
            for ch in pat:
                if ch not in self._goto[s]:
                    self._goto.append({})
                    self._out.append([])
                    self._goto[s][ch] = len(self._goto) - 1
                s = self._goto[s][ch]
            self._out[s].append(pid)
        # BFS failure links; merge output sets along failures
        self._fail = [0] * len(self._goto)
        q = deque()
        for s in self._goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self._goto[r].items():
                q.append(s)
                f = self._fail[r]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[s] = self._goto[f].get(ch, 0) if self._goto[f].get(ch, 0) != s else 0
                self._out[s] = self._out[s] + self._out[self._fail[s]]

    def count_matches(self, text: str) -> list[int]:
        """Occurrence count per pattern id (all matches, overlaps included
        — the automaton's natural semantics)."""
        counts = [0] * len(self.patterns)
        s = 0
        for ch in text:
            while s and ch not in self._goto[s]:
                s = self._fail[s]
            s = self._goto[s].get(ch, 0)
            for pid in self._out[s]:
                counts[pid] += 1
        return counts
