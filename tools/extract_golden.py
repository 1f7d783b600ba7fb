#!/usr/bin/env python3
"""Extract the reference's golden query corpus and its expected results from
/root/reference/src/server/query_handler_test.go into:

  tools/golden_queries.json   — every distinct SQL statement key
  tools/golden_expected.json  — expected column names / first-row values
                                (literal entries only; computed Go entries
                                like uint32ToString(...) are skipped)

graft.CompatAudit replays these through the dialect front end.
"""
import collections
import json
import re

SRC = "/root/reference/src/server/query_handler_test.go"


def un(s: str) -> str:
    try:
        return s.encode().decode("unicode_escape")
    except Exception:
        return s


def parse_list(line: str):
    inner = line.strip().rstrip(",")
    m = re.match(r"\{(.*)\}$", inner)
    if m is None:
        return None
    items = []
    # entries are double-quoted Go strings, backquoted raw strings (which may
    # contain commas and inner double quotes), or computed calls
    for mo in re.finditer(
        r'"((?:[^"\\]|\\.)*)"|`([^`]*)`|([A-Za-z][\w.()]*\([^()]*\))', m.group(1)
    ):
        if mo.group(3):
            return None  # non-literal entry (e.g. uint32ToString(...))
        if mo.group(2) is not None:
            items.append(mo.group(2))
        else:
            items.append(un(mo.group(1)))
    return items


def main():
    src = open(SRC).read()
    keys = re.findall(r'^\t+"((?:[^"\\]|\\.)*)":\s*\{\s*$', src, re.M)
    queries, seen = [], set()
    for q in keys:
        u = un(q)
        if re.match(
            r"(?is)^\s*(SELECT|WITH|SHOW|SET|BEGIN|COMMIT|ROLLBACK|DISCARD|"
            r"EXPLAIN|VALUES|TABLE|CREATE|DROP|REFRESH|ALTER|COPY|INSERT|"
            r"UPDATE|DELETE|--|/\*|\s*$)",
            u,
        ) and u not in seen:
            seen.add(u)
            queries.append(u)
    json.dump(queries, open("tools/golden_queries.json", "w"), indent=0)

    blocks = re.findall(
        r'^\t+"((?:[^"\\]|\\.)*)":\s*\{\s*\n'
        r'((?:\t+"(?:description|types|values)":\s*\{[^\n]*\n)+)\t+\}',
        src,
        re.M,
    )
    expected = {}
    for q, body in blocks:
        entry = {}
        for key in ("description", "values"):
            m = re.search(r'"%s":\s*(\{[^\n]*)' % key, body)
            if m:
                v = parse_list(m.group(1))
                if v is not None:
                    entry[key] = v
        if entry:
            expected[un(q)] = entry
    json.dump(expected, open("tools/golden_expected.json", "w"), indent=0)
    counts = collections.Counter(
        q.split()[0].upper() if q.split() else "EMPTY" for q in queries
    )
    print(len(queries), "queries;", len(expected), "expectation entries;", dict(counts))


if __name__ == "__main__":
    main()
