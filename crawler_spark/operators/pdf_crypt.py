"""Standard security handler for the S8 PDF decode path (stdlib-only).

The reference consumes encrypted PDFs transparently through pdfjs
(``/root/reference/src/lib/processPDf.ts:13-97`` — ``getDocument``
decrypts before ``getTextContent``). This module re-expresses the
*standard* security handler (PDF 32000-1:2008 §7.6.3 + the ISO
32000-2 / Acrobat X R6 extension) with nothing beyond ``hashlib``:

* **RC4** (V1/V2, R2/R3): 40- and 128-bit keys, the md5 key schedule
  of Algorithm 2 and the per-object key of Algorithm 1.
* **AES-128 "AESV2"** (V4, R4): per-object key with the ``sAlT``
  suffix; CBC with a 16-byte IV prefix and PKCS#7 padding.
* **AES-256 "AESV3"** (V5, R6): SHA-2 hardened derivation
  (Algorithm 2.B), file key unwrapped from /UE; the file key IS the
  object key.

The AES core is a from-scratch FIPS-197 implementation (encrypt +
decrypt, 128/256-bit keys) — ~100 lines, fine at fixture scale and
used per-stream, not per-byte. Empty user password only (the
overwhelmingly common "owner-locked" case pdfjs opens silently);
password-protected documents raise so callers can skip the document
rather than emit garbage.
"""

from __future__ import annotations

import functools
import hashlib
import struct

# ---------------------------------------------------------------------- RC4


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------ AES (FIPS-197)

def _build_sbox() -> bytes:
    # multiplicative inverse in GF(2^8)/0x11B, then the affine map —
    # derived, not transcribed, so the table can't be mistyped
    exp, log = [0] * 512, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x1B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for a in range(256):
        inv = 0 if a == 0 else exp[255 - log[a]]
        b = 0
        for i in range(8):
            bit = (
                (inv >> i)
                ^ (inv >> ((i + 4) % 8))
                ^ (inv >> ((i + 5) % 8))
                ^ (inv >> ((i + 6) % 8))
                ^ (inv >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            b |= bit << i
        sbox[a] = b
    return bytes(sbox)


_SBOX = _build_sbox()
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = b"\x01\x02\x04\x08\x10\x20\x40\x80\x1b\x36\x6c\xd8\xab\x4d"


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL = [[0] * 256 for _ in range(16)]
for _c in (1, 2, 3, 9, 11, 13, 14):
    for _a in range(256):
        r, a, c = 0, _a, _c
        while c:
            if c & 1:
                r ^= a
            a = _xtime(a)
            c >>= 1
        _MUL[_c][_a] = r


class AES:
    """AES-128/192/256 block cipher, encrypt + decrypt."""

    def __init__(self, key: bytes):
        nk = len(key) // 4
        if nk not in (4, 6, 8):
            raise ValueError("AES key must be 16/24/32 bytes")
        self.nr = nk + 6
        w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([w[i - nk][j] ^ t[j] for j in range(4)])
        self.rk = [sum((w[4 * r + c] for c in range(4)), []) for r in range(self.nr + 1)]

    @staticmethod
    def _add(state: list[int], rk: list[int]) -> None:
        for i in range(16):
            state[i] ^= rk[i]

    def encrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        self._add(s, self.rk[0])
        for rnd in range(1, self.nr + 1):
            s = [_SBOX[b] for b in s]
            # ShiftRows (column-major state: s[r + 4c])
            s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
            if rnd < self.nr:
                t = s[:]
                for c in range(0, 16, 4):
                    a0, a1, a2, a3 = t[c : c + 4]
                    s[c] = _MUL[2][a0] ^ _MUL[3][a1] ^ a2 ^ a3
                    s[c + 1] = a0 ^ _MUL[2][a1] ^ _MUL[3][a2] ^ a3
                    s[c + 2] = a0 ^ a1 ^ _MUL[2][a2] ^ _MUL[3][a3]
                    s[c + 3] = _MUL[3][a0] ^ a1 ^ a2 ^ _MUL[2][a3]
            self._add(s, self.rk[rnd])
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        self._add(s, self.rk[self.nr])
        for rnd in range(self.nr - 1, -1, -1):
            # InvShiftRows then InvSubBytes
            s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
            s = [_INV_SBOX[b] for b in s]
            self._add(s, self.rk[rnd])
            if rnd > 0:
                t = s[:]
                for c in range(0, 16, 4):
                    a0, a1, a2, a3 = t[c : c + 4]
                    s[c] = _MUL[14][a0] ^ _MUL[11][a1] ^ _MUL[13][a2] ^ _MUL[9][a3]
                    s[c + 1] = _MUL[9][a0] ^ _MUL[14][a1] ^ _MUL[11][a2] ^ _MUL[13][a3]
                    s[c + 2] = _MUL[13][a0] ^ _MUL[9][a1] ^ _MUL[14][a2] ^ _MUL[11][a3]
                    s[c + 3] = _MUL[11][a0] ^ _MUL[13][a1] ^ _MUL[9][a2] ^ _MUL[14][a3]
        return bytes(s)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    if len(data) % 16:
        raise ValueError("AES-CBC data not block-aligned")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        dec = aes.decrypt_block(blk)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    if unpad and out:
        n = out[-1]
        if not 1 <= n <= 16:
            raise ValueError("bad PKCS#7 padding")
        out = out[:-n]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("AES-CBC data not block-aligned")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes.encrypt_block(blk)
        out += prev
    return bytes(out)


# ----------------------------------------------- standard security handler

PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def file_key_rc4(
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    password: bytes = b"",
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the RC4/AESV2 file encryption key (R2/R3/R4).

    For R>=4 with /EncryptMetadata false, Algorithm 2 step (f) appends
    FF FF FF FF to the MD5 input (ISO 32000-1 §7.6.3.3).
    """
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    n = length_bits // 8 if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def user_value_rc4(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry for an empty user pwd."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def owner_value_rc4(r: int, length_bits: int, password: bytes = b"") -> bytes:
    """Algorithm 3: /O for owner password == user password (empty)."""
    key = hashlib.md5(_pad_password(password)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    n = length_bits // 8 if r >= 3 else 5
    o = rc4(key[:n], _pad_password(password))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key[:n]), o)
    return o


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object RC4/AESV2 key."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


# ----------------------------------------------------- AES-256 (V5 R6)


@functools.lru_cache(maxsize=256)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the R6 hardened SHA-2 hash.
    Memoized: the hash is deliberately slow (64+ AES-CBC rounds over a
    4 KiB buffer) and a corpus of same-password documents repeats the
    same (password, salt) pairs."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def user_values_r6(password: bytes = b"") -> tuple[bytes, bytes, bytes]:
    """(U, UE, file_key) for R6 with the given user password. U carries
    validation salt at [32:40] and key salt at [40:48] (random in real
    writers; fixed here for deterministic fixtures)."""
    vsalt, ksalt = b"valsalt1", b"keysalt1"
    u = _hash_2b(password, vsalt) + vsalt + ksalt
    file_key = bytes(range(32))  # deterministic fixture file key
    ik = _hash_2b(password, ksalt)
    ue = aes_cbc_encrypt(ik, bytes(16), file_key, pad=False)
    return u, ue, file_key


def file_key_r6(u: bytes, ue: bytes, password: bytes = b"") -> bytes | None:
    """Algorithm 2.A (user-password path): validate and unwrap the
    file key from /U + /UE. None = wrong password."""
    vsalt, ksalt = u[32:40], u[40:48]
    if _hash_2b(password, vsalt) != u[:32]:
        return None
    ik = _hash_2b(password, ksalt)
    return aes_cbc_decrypt(ik, bytes(16), ue[:32], unpad=False)


# ----------------------------------------------------------- stream layer


def decrypt_stream(data: bytes, fkey: bytes, num: int, gen: int, cfm: str) -> bytes:
    """Decrypt one stream's raw bytes. ``cfm``: V2 (RC4), AESV2, AESV3."""
    if cfm == "V2":
        return rc4(object_key(fkey, num, gen, aes=False), data)
    if cfm == "AESV2":
        key = object_key(fkey, num, gen, aes=True)
    elif cfm == "AESV3":
        key = fkey
    else:
        raise ValueError(f"unsupported crypt filter {cfm}")
    if len(data) < 16:
        raise ValueError("AES stream shorter than its IV")
    return aes_cbc_decrypt(key, data[:16], data[16:])


def encrypt_stream(data: bytes, fkey: bytes, num: int, gen: int, cfm: str) -> bytes:
    """Fixture-side partner of :func:`decrypt_stream` (deterministic
    IV derived from the object number — fine for test fixtures)."""
    if cfm == "V2":
        return rc4(object_key(fkey, num, gen, aes=False), data)
    if cfm == "AESV2":
        key = object_key(fkey, num, gen, aes=True)
    elif cfm == "AESV3":
        key = fkey
    else:
        raise ValueError(f"unsupported crypt filter {cfm}")
    iv = hashlib.md5(b"iv%d" % num).digest()
    return iv + aes_cbc_encrypt(key, iv, data)


# ---------------------------------------------------------------------------
# Public-key security handler (/Adobe.PubSec, ISO 32000-1 §7.6.4):
# each /Recipients entry is a CMS EnvelopedData blob (RFC 5652) whose
# KeyTransRecipientInfo carries an RSA-PKCS#1-v1.5-encrypted content
# key; the AES/RC4-encrypted content is 20 seed bytes + 4 permission
# bytes. The file key is SHA-1 over seed || every recipient blob
# (|| FF FF FF FF when /EncryptMetadata false); object keys then
# derive exactly as in the standard handler. Everything below is
# stdlib-only: RSA is modular exponentiation over deterministic
# Miller-Rabin primes, DER is a minimal TLV reader/writer.
# ---------------------------------------------------------------------------

_OID_ENVELOPED = bytes.fromhex("2a864886f70d010703")  # 1.2.840.113549.1.7.3
_OID_DATA = bytes.fromhex("2a864886f70d010701")       # ...1.7.1
_OID_RSA = bytes.fromhex("2a864886f70d010101")        # ...1.1.1
_OID_AES128_CBC = bytes.fromhex("608648016503040102")  # 2.16.840.1.101.3.4.1.2

_MR_BASES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in _MR_BASES:
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in _MR_BASES:
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, tag: bytes) -> int:
    x = int.from_bytes(hashlib.sha256(tag).digest() * (bits // 128 + 1),
                       "big")
    x |= (1 << (bits - 1)) | (1 << (bits - 2)) | 1
    x &= (1 << bits) - 1
    while not _is_prime(x) or (x - 1) % 65537 == 0:
        x += 2
    return x


_RSA_CACHE: dict[str, tuple[int, int, int]] = {}


def rsa_fixture_key(bits: int = 1024) -> tuple[int, int, int]:
    """Deterministic RSA key (n, e, d) for PubSec fixtures — derived
    from fixed seeds, cached per size."""
    key = f"k{bits}"
    if key not in _RSA_CACHE:
        p = _gen_prime(bits // 2, b"pubsec-fixture-p")
        q = _gen_prime(bits // 2, b"pubsec-fixture-q")
        n = p * q
        e = 65537
        d = pow(e, -1, (p - 1) * (q - 1))
        _RSA_CACHE[key] = (n, e, d)
    return _RSA_CACHE[key]


def rsa_encrypt_pkcs1(n: int, e: int, msg: bytes) -> bytes:
    """RSA PKCS#1 v1.5 encryption (deterministic nonzero padding —
    fixture use; real encryptors randomize PS)."""
    k = (n.bit_length() + 7) // 8
    pslen = k - 3 - len(msg)
    if pslen < 8:
        raise ValueError("RSA: message too long")
    ps = bytearray()
    ctr = 0
    while len(ps) < pslen:
        for b in hashlib.sha256(b"ps%d" % ctr).digest():
            if b and len(ps) < pslen:
                ps.append(b)
        ctr += 1
    em = b"\x00\x02" + bytes(ps) + b"\x00" + msg
    return pow(int.from_bytes(em, "big"), e, n).to_bytes(k, "big")


def rsa_decrypt_pkcs1(n: int, d: int, cipher: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    em = pow(int.from_bytes(cipher, "big"), d, n).to_bytes(k, "big")
    if em[:2] != b"\x00\x02":
        raise ValueError("RSA: bad PKCS#1 padding")
    sep = em.find(b"\x00", 2)
    if sep < 10:
        raise ValueError("RSA: bad PKCS#1 padding")
    return em[sep + 1 :]


# --- DER TLV ---------------------------------------------------------------


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _der(tag: int, payload: bytes) -> bytes:
    return bytes([tag]) + _der_len(len(payload)) + payload


def _der_read(data: bytes, pos: int) -> tuple[int, int, int]:
    """→ (tag, value_start, value_end) of the TLV at ``pos``."""
    if pos + 2 > len(data):
        raise ValueError("DER: truncated")
    tag = data[pos]
    ln = data[pos + 1]
    vs = pos + 2
    if ln & 0x80:
        nb = ln & 0x7F
        if nb == 0 or nb > 4 or vs + nb > len(data):
            raise ValueError("DER: bad length")
        ln = int.from_bytes(data[vs : vs + nb], "big")
        vs += nb
    ve = vs + ln
    if ve > len(data):
        raise ValueError("DER: truncated value")
    return tag, vs, ve


def _der_children(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        tag, vs, ve = _der_read(data, pos)
        yield tag, vs, ve
        pos = ve


def make_pubsec_recipient(
    seed: bytes, perms: int, n: int, e: int, cek: bytes, iv: bytes
) -> bytes:
    """CMS EnvelopedData blob: KeyTransRecipientInfo(RSA PKCS#1 v1.5
    over ``cek``) + AES-128-CBC encryptedContentInfo over
    seed || 4-byte permissions."""
    content = aes_cbc_encrypt(cek, iv, seed + perms.to_bytes(4, "big"))
    ktri = _der(0x30, b"".join([
        _der(0x02, b"\x00"),  # version 0
        _der(0x30, _der(0x30, b"") + _der(0x02, b"\x01")),  # issuer+serial
        _der(0x30, _der(0x06, _OID_RSA) + _der(0x05, b"")),
        _der(0x04, rsa_encrypt_pkcs1(n, e, cek)),
    ]))
    eci = _der(0x30, b"".join([
        _der(0x06, _OID_DATA),
        _der(0x30, _der(0x06, _OID_AES128_CBC) + _der(0x04, iv)),
        _der(0x80, content),  # [0] IMPLICIT encryptedContent
    ]))
    enveloped = _der(0x30, b"".join([
        _der(0x02, b"\x00"),
        _der(0x31, ktri),  # SET OF RecipientInfo
        eci,
    ]))
    return _der(0x30, _der(0x06, _OID_ENVELOPED) + _der(0xA0, enveloped))


def open_pubsec_recipient(blob: bytes, n: int, d: int) -> bytes | None:
    """Decrypt one /Recipients blob with the RSA private key →
    seed || 4 permission bytes, or None when the key does not fit."""
    try:
        _t, vs, ve = _der_read(blob, 0)  # ContentInfo SEQUENCE
        kids = list(_der_children(blob, vs, ve))
        if len(kids) != 2 or blob[kids[0][1] : kids[0][2]] != _OID_ENVELOPED:
            return None
        _t, evs, eve = _der_read(blob, kids[1][1])  # EnvelopedData
        parts = list(_der_children(blob, evs, eve))
        # version, recipientInfos SET, encryptedContentInfo
        ktri = next(_der_children(blob, parts[1][1], parts[1][2]))
        kfields = list(_der_children(blob, ktri[1], ktri[2]))
        alg = list(_der_children(blob, kfields[2][1], kfields[2][2]))
        if blob[alg[0][1] : alg[0][2]] != _OID_RSA:
            return None
        enc_key = blob[kfields[3][1] : kfields[3][2]]
        cek = rsa_decrypt_pkcs1(n, d, enc_key)
        eci = list(_der_children(blob, parts[2][1], parts[2][2]))
        calg = list(_der_children(blob, eci[1][1], eci[1][2]))
        if blob[calg[0][1] : calg[0][2]] != _OID_AES128_CBC:
            return None
        iv = blob[calg[1][1] : calg[1][2]]
        content = blob[eci[2][1] : eci[2][2]]
        if len(cek) != 16 or len(iv) != 16:
            return None
        plain = aes_cbc_decrypt(cek, iv, content)
        return plain if len(plain) >= 24 else None
    except (ValueError, IndexError, StopIteration):
        return None


def pubsec_file_key(
    seed: bytes, recipients: list[bytes], bits: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """§7.6.4 Algorithm: SHA-1 over seed || every recipient blob
    (|| FF FF FF FF when metadata stays clear), truncated to the key
    length."""
    h = hashlib.sha1(seed)
    for blob in recipients:
        h.update(blob)
    if not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    return h.digest()[: bits // 8]
