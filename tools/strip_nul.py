#!/usr/bin/env python3
"""One-shot hygiene: replace literal NUL bytes in source with \\u0000 escapes."""
NUL = b"\x00"
for p in [
    "src/main/scala/graft/CompatAudit.scala",
    "src/test/scala/graft/WireSpec.scala",
]:
    data = open(p, "rb").read()
    data = data.replace(b"'" + NUL + b"'", b"'\\u0000'")
    data = data.replace(NUL, b"\\u0000")
    open(p, "wb").write(data)
    print(p, "cleaned")
