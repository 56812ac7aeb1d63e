"""Pure-Python XXH64 (public algorithm, Yann Collet's spec) — independent
reference used to validate the DuckDB-SQL xxh64 oracle expressions.
Short-input path only (len < 32), which covers every string the oracles
hash (tokens <= 8 bytes, 3-token shingles <= 26 bytes)."""

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    assert n < 32, "short-input path only"
    acc = (seed + P5 + n) & M
    i = 0
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        k = rotl((k * P2) & M, 31)
        k = (k * P1) & M
        acc ^= k
        acc = (rotl(acc, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        acc ^= (k * P1) & M
        acc = (rotl(acc, 23) * P2 + P3) & M
        i += 4
    while i < n:
        acc ^= (data[i] * P5) & M
        acc = (rotl(acc, 11) * P1) & M
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & M
    acc ^= acc >> 29
    acc = (acc * P3) & M
    acc ^= acc >> 32
    return acc


def to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


if __name__ == "__main__":
    # public test vectors (xxhash reference implementation)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999, hex(xxh64(b"", 0))
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B, hex(xxh64(b"a", 0))
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999, hex(xxh64(b"abc", 0))
    print("xxh64_ref: public test vectors OK")
