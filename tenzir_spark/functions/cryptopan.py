"""Crypto-PAn prefix-preserving IP pseudonymization (reference:
libtenzir/src/ip.cpp:36-95 ``address_encryptor``, exercised by
libtenzir/test/ip.cpp with the public node-cryptopan vector sets).

The reference builds a per-address one-time pad from AES-128-ECB:

- the 32-byte seed splits into an AES key (bytes 0..15) and a pad
  source (bytes 16..31); ``pad = AES(key, seed[16:32])``;
- pad bit 0 is the MSB of ``AES(pad)``; pad bit ``i`` (i >= 1) is the
  MSB of ``AES(first i bits of the original address ++ low bits of
  pad)`` — the classic Crypto-PAn construction, which makes the
  mapping prefix-preserving;
- IPv4 runs 32 steps over the last 4 bytes of the v4-mapped form
  (byte_offset 12, ip.cpp:101); IPv6 runs 128 steps over all 16.

No OpenSSL binding exists in this container, so the AES-128 block
cipher is implemented here directly from FIPS-197 (encrypt-only) as
table-driven numpy over ``(n_blocks, 16)`` uint8 arrays.  That shape
is what makes the operator batch-friendly: one Crypto-PAn *step*
encrypts the whole Arrow batch's blocks in a single vectorized call,
so a batch of N addresses costs 128 vectorized AES calls, not 128*N
scalar ones.  The S-box is derived programmatically (GF(2^8)
inversion + affine transform) rather than transcribed.
"""
from __future__ import annotations

import ipaddress

import numpy as np

# --------------------------------------------------------------- AES tables


def _build_sbox() -> np.ndarray:
    # GF(2^8) inverse via log/antilog tables over generator 3, then the
    # FIPS-197 affine transform.
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 0x03 = x * 2 ^ x
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = np.zeros(256, dtype=np.uint8)
    for b in range(256):
        inv = 0 if b == 0 else exp[255 - log[b]]
        s = inv
        for shift in (1, 2, 3, 4):
            s ^= ((inv << shift) | (inv >> (8 - shift))) & 0xFF
        sbox[b] = s ^ 0x63
    return sbox


_SBOX = _build_sbox()

# xtime (multiply by 2 in GF(2^8)) as a lookup so MixColumns stays in
# uint8 numpy without per-element branching.
_XTIME = np.array(
    [((b << 1) ^ 0x1B if b & 0x80 else b << 1) & 0xFF for b in range(256)],
    dtype=np.uint8,
)

# ShiftRows on the flat 16-byte block layout (FIPS-197 column-major
# state): out[c*4 + r] = in[((c + r) % 4) * 4 + r].
_SHIFT_ROWS = np.array(
    [((c + r) % 4) * 4 + r for c in range(4) for r in range(4)],
    dtype=np.intp,
)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def expand_key(key: bytes) -> np.ndarray:
    """FIPS-197 key schedule for AES-128: 11 round keys, each 16 bytes."""
    assert len(key) == 16
    words = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    sbox = _SBOX
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [int(sbox[b]) for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    flat = [b for w in words for b in w]
    return np.array(flat, dtype=np.uint8).reshape(11, 16)


def aes128_encrypt_blocks(blocks: np.ndarray, round_keys: np.ndarray
                          ) -> np.ndarray:
    """Encrypt ``(n, 16)`` uint8 blocks with AES-128-ECB, vectorized
    over the batch dimension."""
    state = blocks ^ round_keys[0]
    for rnd in range(1, 10):
        state = _SBOX[state][:, _SHIFT_ROWS]
        # MixColumns over the (n, 4, 4) column view: each state column
        # holds bytes s0..s3; s0' = 2*s0 ^ 3*s1 ^ s2 ^ s3 etc., with
        # 3*x = xtime(x) ^ x.
        cols = state.reshape(-1, 4, 4)
        rot1 = np.roll(cols, -1, axis=2)
        t = cols ^ rot1
        all_xor = t ^ np.roll(cols, -2, axis=2) ^ np.roll(cols, -3, axis=2)
        state = (_XTIME[t] ^ all_xor ^ cols).reshape(-1, 16)
        state ^= round_keys[rnd]
    state = _SBOX[state][:, _SHIFT_ROWS]
    return state ^ round_keys[10]


# ------------------------------------------------------------- Crypto-PAn


def parse_seed(seed: str) -> bytes:
    """Hex seed string -> 32 bytes, zero-extended; a trailing odd hex
    digit parses as its own byte (pseudonymize.cpp:141-152)."""
    out = bytearray(32)
    max_len = min(64, len(seed))
    i = 0
    while i * 2 < max_len:
        pos = i * 2
        chunk = seed[pos:pos + 2] if pos + 2 <= len(seed) else seed[pos:pos + 1]
        out[i] = _strtoul16(chunk)
        i += 1
    return bytes(out)


def _strtoul16(s: str) -> int:
    """C ``strtoul(s, 0, 16)``: parse the longest valid leading hex
    prefix, 0 if none — the reference does not validate its seed
    (pseudonymize.cpp:151), so neither do we."""
    n = 0
    while n < len(s) and s[n] in "0123456789abcdefABCDEF":
        n += 1
    return int(s[:n], 16) if n else 0


class CryptoPan:
    """Batch Crypto-PAn encryptor for a fixed 32-byte seed."""

    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self._rk = expand_key(seed[:16])
        pad_in = np.frombuffer(seed[16:32], dtype=np.uint8).reshape(1, 16)
        self._pad = aes128_encrypt_blocks(pad_in, self._rk)[0]

    def _pseudonymize_bytes(self, orig: np.ndarray, n_bytes: int
                            ) -> np.ndarray:
        """``orig``: (n, n_bytes) uint8 of address bytes to encrypt.
        Returns the XOR-encrypted bytes.  One AES batch call per bit
        position — 32 calls for v4, 128 for v6, regardless of n."""
        n = orig.shape[0]
        if n == 0:
            return orig
        pad = self._pad
        cipher_in = np.broadcast_to(pad, (n, 16)).copy()
        otp = np.zeros((n, n_bytes), dtype=np.uint8)
        # bit 0 of the pad comes from AES(pad) itself (ip.cpp:77)
        out = aes128_encrypt_blocks(cipher_in, self._rk)
        otp[:, 0] |= out[:, 0] & 0x80
        for i in range(n_bytes * 8 - 1):
            byte_index, bit_index = divmod(i, 8)
            padding_mask = 0xFF >> (bit_index + 1)
            original_mask = (~padding_mask) & 0xFF
            cipher_in[:, byte_index] = (
                (orig[:, byte_index] & original_mask)
                | (pad[byte_index] & padding_mask)
            )
            out = aes128_encrypt_blocks(cipher_in, self._rk)
            j = i + 1
            byte_index, bit_index = divmod(j, 8)
            otp[:, byte_index] |= (out[:, 0] & 0x80) >> bit_index
        return orig ^ otp

    def pseudonymize_batch(self, addrs: list[str | None]) -> list[str | None]:
        """Pseudonymize a batch of textual IPs; non-IP/None pass
        through as None/unchanged semantics of the operator layer."""
        v4_idx, v4_bytes = [], []
        v6_idx, v6_bytes = [], []
        result: list[str | None] = [None] * len(addrs)
        for i, a in enumerate(addrs):
            if a is None:
                continue
            try:
                ip = ipaddress.ip_address(a)
            except ValueError:
                continue
            if ip.version == 4:
                v4_idx.append(i)
                v4_bytes.append(ip.packed)
            else:
                v6_idx.append(i)
                v6_bytes.append(ip.packed)
        if v4_idx:
            arr = np.frombuffer(b"".join(v4_bytes), dtype=np.uint8)
            enc = self._pseudonymize_bytes(arr.reshape(-1, 4), 4)
            for row, i in enumerate(v4_idx):
                result[i] = str(ipaddress.IPv4Address(bytes(enc[row])))
        if v6_idx:
            arr = np.frombuffer(b"".join(v6_bytes), dtype=np.uint8)
            enc = self._pseudonymize_bytes(arr.reshape(-1, 16), 16)
            for row, i in enumerate(v6_idx):
                result[i] = str(ipaddress.IPv6Address(bytes(enc[row])))
        return result
