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

# Numeric values of the jackc/pgtype OID constants the test file references —
# these are the standard PostgreSQL catalog OIDs (select oid, typname from
# pg_type), public protocol-level constants.
PGTYPE_OIDS = {
    "BoolOID": 16, "ByteaOID": 17, "CharOID": 18, "NameOID": 19,
    "Int8OID": 20, "Int2OID": 21, "Int4OID": 23, "TextOID": 25,
    "OIDOID": 26, "XIDOID": 28, "JSONOID": 114, "XMLOID": 142,
    "PointOID": 600, "Float4OID": 700, "Float8OID": 701, "InetOID": 869,
    "Int2ArrayOID": 1005, "Int4ArrayOID": 1007, "TextArrayOID": 1009,
    "BPCharOID": 1042, "VarcharOID": 1043, "DateOID": 1082,
    "TimeOID": 1083, "TimestampOID": 1114, "TimestamptzOID": 1184,
    "IntervalOID": 1186, "TimetzOID": 1266, "BitOID": 1560,
    "NumericOID": 1700, "UUIDOID": 2950, "JSONBOID": 3802,
    "TSVectorOID": 3614, "XID8OID": 5069,
}


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
            # resolve uint32ToString(pgtype.XxxOID) to the numeric OID string;
            # any other computed entry makes the whole list non-literal
            oid = re.fullmatch(
                r"uint32ToString\(pgtype\.(\w+)\)", mo.group(3)
            )
            if oid and oid.group(1) in PGTYPE_OIDS:
                items.append(str(PGTYPE_OIDS[oid.group(1)]))
                continue
            return None
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
        for key in ("description", "types", "values"):
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
