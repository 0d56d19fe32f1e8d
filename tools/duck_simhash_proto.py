#!/usr/bin/env python3
"""Prototype: FNV-1a 64 + byte-kgram SimHash64 in pure DuckDB SQL (HUGEINT
modular arithmetic + hex-nibble byte extraction), validated against a Python
reference implementation of the Go kernel (reference: internal/dedupe/
dedupe.go:120-185)."""
import duckdb

M64 = 1 << 64
FNV_OFF = 14695981039346656037
FNV_PRIME = 1099511628211

def fnv1a64(data: bytes) -> int:
    h = FNV_OFF
    for b in data:
        h ^= b
        h = (h * FNV_PRIME) % M64
    return h

def simhash64(text: str, k: int) -> int:
    bs = text.encode("utf-8")
    if k <= 0 or len(bs) < k:
        return 0
    counters = [0] * 64
    for i in range(len(bs) - k + 1):
        h = fnv1a64(bs[i:i + k])
        for bit in range(64):
            counters[bit] += 1 if (h >> bit) & 1 else -1
    sig = 0
    for bit in range(64):
        if counters[bit] > 0:
            sig |= 1 << bit
    return sig

def to_signed(u: int) -> int:
    return u - M64 if u >= (1 << 63) else u

# ---------------- DuckDB SQL builders (mirror OracleSql.scala) -------------

# list of byte values (BIGINT) of the UTF-8 encoding of a VARCHAR expr,
# via hex-nibble extraction (DuckDB has no get_byte).
def sql_bytes(x: str) -> str:
    return (f"list_transform(range(1, strlen({x}) + 1), i -> "
            f"CAST(strpos('0123456789ABCDEF', substr(hex(encode({x})), 2*i-1, 1)) - 1 AS BIGINT) * 16 + "
            f"(strpos('0123456789ABCDEF', substr(hex(encode({x})), 2*i, 1)) - 1))")

# fnv1a64 over a BIGINT[] byte list expr -> HUGEINT in [0, 2^64)
def sql_fnv(bytes_expr: str) -> str:
    return (f"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), {bytes_expr}), "
            f"(h, b) -> ((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), b)) * 1099511628211) "
            f"% CAST(18446744073709551616 AS HUGEINT))")

# simhash64 over byte k-grams of VARCHAR expr x -> signed BIGINT
def sql_simhash(x: str, k: int) -> str:
    bts = f"bts"   # bound via lambda-less CTE style: caller supplies bytes col
    hs = (f"list_transform(range(1, len({bts}) - {k} + 2), i -> "
          f"{sql_fnv(f'list_slice({bts}, i, i + {k} - 1)')})")
    # per bit: set iff #set > #total/2 i.e. 2*set > total
    sig_u = (f"list_sum(list_transform(range(0, 64), b -> "
             f"CASE WHEN 2 * len(list_filter(hss, h -> (h // (CAST(1 AS HUGEINT) << b)) % 2 = 1)) > len(hss) "
             f"THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END))")
    return bts, hs, sig_u

con = duckdb.connect()

# 1) byte extraction
for s in ["abc", "Café résumé", "", "a"]:
    got = con.execute(f"SELECT {sql_bytes('?')}".replace('?', f"'{s}'")).fetchone()[0]
    exp = list(s.encode('utf-8'))
    assert got == exp, (s, got, exp)
print("bytes OK")

# 2) fnv
for s in ["abc", "hello world", "", "Café", "hp:0:0"]:
    q = f"SELECT {sql_fnv(sql_bytes(f'$tok$'))}".replace("$tok$", f"'{s}'")
    got = con.execute(q).fetchone()[0]
    exp = fnv1a64(s.encode('utf-8'))
    assert int(got) == exp, (s, got, exp)
print("fnv OK")

# 3) simhash via CTE with bytes + hashes as columns
texts = ["the quick brown fox jumps over the lazy dog",
         "café au lait résumé naïve", "ab", "", "hello"]
k = 5
rows = con.execute(f"""
WITH t(id, txt) AS (VALUES {', '.join(f"({i}, '{s}')" for i, s in enumerate(texts))}),
b AS (SELECT id, txt, {sql_bytes('txt')} AS bts FROM t),
h AS (SELECT id, txt, CASE WHEN len(bts) < {k} THEN CAST([] AS HUGEINT[]) ELSE
      list_transform(range(1, len(bts) - {k} + 2), i -> {sql_fnv(f'list_slice(bts, i, i + {k} - 1)')}) END AS hss FROM b),
s AS (SELECT id, txt, CASE WHEN len(hss) = 0 THEN CAST(0 AS HUGEINT) ELSE
      list_sum(list_transform(range(0, 64), b2 ->
        CASE WHEN 2 * len(list_filter(hss, hh -> (hh // (CAST(1 AS HUGEINT) << b2)) % 2 = 1)) > len(hss)
             THEN (CAST(1 AS HUGEINT) << b2) ELSE CAST(0 AS HUGEINT) END)) END AS sig_u FROM h)
SELECT id, txt, CAST(CASE WHEN sig_u >= CAST(9223372036854775808 AS HUGEINT)
       THEN sig_u - CAST(18446744073709551616 AS HUGEINT) ELSE sig_u END AS BIGINT) AS sig
FROM s ORDER BY id
""").fetchall()
for (i, txt, sig) in rows:
    exp = to_signed(simhash64(txt, k))
    assert sig == exp, (txt, sig, exp)
print("simhash OK")
