#!/usr/bin/env python3
"""Harvest common-English vocabulary from the PUBLIC prose shipped on
this machine, as a partial stand-in for dwyl/english-words'
words_dictionary.json (~466k entries), which the reference loads
(matcher.py:51-54) but which is unreachable in this sandbox (no
network egress; the pip/file caches hold no word lists — see
BASELINE.md "eng dictionary" note).

Three independent corpora:
  A. English man pages (/usr/share/man/man*, locale subdirs excluded)
  B. Python-stdlib prose (comments + docstrings only, not identifiers)
  C. /usr/share/doc texts (changelogs, READMEs, copyright files)

A token is accepted when it clears a per-corpus document-frequency bar
in at least TWO of the three corpora — identifiers, locale words, and
typos are almost always confined to one corpus, while genuine English
prose words recur across all three. Extra shape filters: [a-z]{3,24},
must contain a vowel.

Output: scratch/harvested_words.txt, merged into the engine's
english_words.txt by scratch/gen_dicts.py (goldens must be
regenerated afterwards: gen_dicts.py && gen_goldens.py).
"""
import collections
import gzip
import os
import re
import sys

TOK = re.compile(r"[a-z]{3,24}")
VOWEL = re.compile(r"[aeiouy]")

MAN_MIN_DF = 3
PY_MIN_DF = 2
DOC_MIN_DF = 3


def man_df():
    df = collections.Counter()
    base = "/usr/share/man"
    for d in os.listdir(base):
        if not d.startswith("man"):  # skip de/fr/... locale subtrees
            continue
        for root, _, files in os.walk(os.path.join(base, d)):
            for f in files:
                if not f.endswith(".gz"):
                    continue
                try:
                    raw = gzip.open(os.path.join(root, f), "rt",
                                    errors="ignore").read()
                except Exception:
                    continue
                text = "\n".join(l for l in raw.splitlines()
                                 if not l.startswith("."))  # troff directives
                for t in set(TOK.findall(text.lower())):
                    df[t] += 1
    return df


def py_df():
    df = collections.Counter()
    for root, _, files in os.walk(f"/usr/lib/python3.{sys.version_info[1]}"
                                  if os.path.isdir(
                                      f"/usr/lib/python3.{sys.version_info[1]}")
                                  else "/usr/lib/python3.11"):
        for f in files:
            if not f.endswith(".py"):
                continue
            try:
                src = open(os.path.join(root, f), errors="ignore").read()
            except Exception:
                continue
            prose = [l.strip() for l in src.splitlines()
                     if l.strip().startswith("#")]
            for m in re.finditer(r'"""(.*?)"""', src, re.S):
                prose.append(m.group(1))
            for m in re.finditer(r"'''(.*?)'''", src, re.S):
                prose.append(m.group(1))
            for t in set(TOK.findall("\n".join(prose).lower())):
                df[t] += 1
    return df


def doc_df():
    df = collections.Counter()
    for root, _, files in os.walk("/usr/share/doc"):
        for f in files:
            p = os.path.join(root, f)
            try:
                if f.endswith(".gz"):
                    text = gzip.open(p, "rt", errors="ignore").read()
                elif (f.endswith((".txt", ".md")) or "README" in f
                      or f in ("copyright", "NEWS", "TODO", "AUTHORS")):
                    text = open(p, errors="ignore").read()
                else:
                    continue
            except Exception:
                continue
            for t in set(TOK.findall(text.lower())):
                df[t] += 1
    return df


def main():
    man, py, doc = man_df(), py_df(), doc_df()
    words = set()
    for t in set(man) | set(py) | set(doc):
        if not VOWEL.search(t):
            continue
        votes = ((man.get(t, 0) >= MAN_MIN_DF) + (py.get(t, 0) >= PY_MIN_DF)
                 + (doc.get(t, 0) >= DOC_MIN_DF))
        if votes >= 2:
            words.add(t)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "scratch", "harvested_words.txt")
    with open(out, "w") as f:
        f.write("\n".join(sorted(words)) + "\n")
    print(f"man={len(man)} py={len(py)} doc={len(doc)} -> harvested {len(words)}")


if __name__ == "__main__":
    main()
