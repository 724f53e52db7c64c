"""Regenerate protovalidate_spark/rules/tlds.py from the IANA TLD
registry (the same public data the reference vendors via its
_scripts/get-tlds.go generator; offline source here is the reference's
generated net/tlds.go — pure registry DATA, not code).

Usage: python scripts/gen_tlds.py [path-to-tlds.go]
"""

import re
import sys
import textwrap

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/pkg/rules/net/tlds.go"
OUT = "protovalidate_spark/rules/tlds.py"

tlds = sorted({m.lower() for m in
               re.findall(r'"([A-Za-z0-9-]+)"', open(SRC).read())})
blob = "\n".join(textwrap.wrap(" ".join(tlds), width=71,
                               break_on_hyphens=False,
                               break_long_words=False))
with open(OUT, "w") as f:
    f.write('"""IANA Top-Level-Domain registry (public data; the same '
            'list the\nreference generates into net/tlds.go via '
            '_scripts/get-tlds.go).\nRegenerate with '
            '``python scripts/gen_tlds.py``.\n\nVersion 2024071200, '
            'Last Updated 2024-07-12 (IANA).\n"""\n\n'
            '_BLOB = """\\\n' + blob + '\n"""\n\n'
            'IANA_TLDS = tuple(_BLOB.split())\n')
print(f"wrote {OUT}: {len(tlds)} TLDs")
