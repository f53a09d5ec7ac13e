"""Real-web audio containers and G.711 A-law, from the public specs
(RIFF/WAVE, Apple AIFF-C, ITU-T G.711) — the container tier above the
raw codecs in functions/media.py, same encoder/decoder twin
discipline as the image containers (functions/tiff.py).

  * ``alaw``: G.711 A-law log-PCM (2:1, fully vectorized; the µ-law
    sibling lives in media.py);
  * WAV: RIFF/WAVE with format tags 1 (PCM 8-bit unsigned / 16-bit
    signed LE), 6 (A-law), 7 (µ-law) and 0x11 (IMA ADPCM in its
    *WAV block framing*: per-block 4-byte predictor/step header +
    low-nibble-first data — a different layout from media.py's raw
    ADP1 stream), multi-channel interleaved for PCM/law, fact/cbSize
    handling, unknown chunks skipped;
  * AIFF: FORM/AIFF with COMM (80-bit extended sample rate) + SSND,
    big-endian PCM 8/16.

Malformed containers raise ValueError → callers quarantine.
"""

from __future__ import annotations

import struct

import numpy as np

from crawler_spark.functions.media import (
    _IMA_INDEX,
    _IMA_STEPS,
    _ulaw_decode,
    encode_audio_ulaw,
)

# --------------------------------------------------------------------------
# G.711 A-law (vectorized; Sun g711.c reference structure)
# --------------------------------------------------------------------------


def encode_audio_alaw(samples: np.ndarray) -> bytes:
    pcm = (np.clip(samples, -1, 1) * 32767).astype(np.int32)
    x13 = pcm >> 3
    neg = x13 < 0
    mag = np.where(neg, -x13 - 1, x13)
    mask = np.where(neg, 0x55, 0xD5)
    # segment = position of the leading 1 above bit 4 (0..7)
    bl = np.zeros_like(mag)
    m = mag.copy()
    for _ in range(13):
        bl = np.where(m > 0, bl + 1, bl)
        m >>= 1
    seg = np.clip(bl - 5, 0, 7)
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((mag >> shift) & 0x0F)
    return (aval ^ mask).astype(np.uint8).tobytes()


def _alaw_decode(b: np.ndarray) -> np.ndarray:
    a = b.astype(np.int32) ^ 0x55
    q = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, q + 8, (q + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.float64)


def decode_audio_alaw(data: bytes) -> np.ndarray:
    """→ float64 samples in [-1, 1]."""
    return _alaw_decode(np.frombuffer(data, np.uint8)) / 32768.0


# --------------------------------------------------------------------------
# IMA ADPCM in WAV block framing (mono)
# --------------------------------------------------------------------------


def _ima_wav_encode_block(
    pcm: np.ndarray, block_samples: int, index: int = 0
) -> tuple[bytes, int]:
    """One block: int16 sample0, uint8 step index, uint8 reserved,
    then nibbles (low first) for samples 1..block_samples-1. The step
    index carries ACROSS blocks via the header (resetting it each
    block causes slope overload at every boundary)."""
    pred = int(pcm[0])
    out = struct.pack("<hBB", pred, index, 0)
    nibbles = []
    for s in pcm[1:block_samples]:
        step = _IMA_STEPS[index]
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        delta = (step >> 3) + ((code & 1) * (step >> 2)) + (
            ((code >> 1) & 1) * (step >> 1)
        ) + (((code >> 2) & 1) * step)
        pred = max(-32768, min(32767, pred + (-delta if code & 8 else delta)))
        index = max(0, min(88, index + _IMA_INDEX[code & 7]))
        nibbles.append(code)
    while len(nibbles) % 8:  # data region is padded to 4-byte words
        nibbles.append(0)
    out += bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    return out, index


def _ima_wav_decode_block(block: bytes, block_samples: int) -> np.ndarray:
    pred, index, _ = struct.unpack_from("<hBB", block, 0)
    index = max(0, min(88, int(index)))
    out = np.empty(block_samples, np.int32)
    out[0] = pred
    body = block[4:]
    for i in range(block_samples - 1):
        if (i >> 1) >= len(body):
            raise ValueError("WAV: truncated ADPCM block")
        byte = body[i >> 1]
        code = (byte >> 4) if i & 1 else (byte & 0x0F)
        step = _IMA_STEPS[index]
        delta = (step >> 3) + ((code & 1) * (step >> 2)) + (
            ((code >> 1) & 1) * (step >> 1)
        ) + (((code >> 2) & 1) * step)
        pred = max(-32768, min(32767, pred + (-delta if code & 8 else delta)))
        index = max(0, min(88, index + _IMA_INDEX[code & 7]))
        out[i + 1] = pred
    return out


# --------------------------------------------------------------------------
# WAV container
# --------------------------------------------------------------------------

_WAV_TAGS = {"pcm8": 1, "pcm16": 1, "alaw": 6, "ulaw": 7, "ima": 0x11}


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = 8000,
    codec: str = "pcm16",
    *,
    block_samples: int = 505,
) -> bytes:
    """float samples in [-1, 1], (n,) mono or (n, ch) interleaved
    (PCM/law only; IMA is mono). block_samples: IMA samples per block
    (default matches the canonical 256-byte block_align)."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    tag = _WAV_TAGS[codec]
    if codec == "pcm16":
        body = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        bits, block_align = 16, 2 * ch
        fmt_extra = b""
    elif codec == "pcm8":
        body = ((np.clip(x, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
        bits, block_align = 8, ch
        fmt_extra = b""
    elif codec == "ulaw":
        body = encode_audio_ulaw(x.reshape(-1))
        bits, block_align = 8, ch
        fmt_extra = struct.pack("<H", 0)
    elif codec == "alaw":
        body = encode_audio_alaw(x.reshape(-1))
        bits, block_align = 8, ch
        fmt_extra = struct.pack("<H", 0)
    elif codec == "ima":
        if ch != 1:
            raise ValueError("WAV: IMA ADPCM encoder is mono-only")
        pcm = (np.clip(x[:, 0], -1, 1) * 32767).astype(np.int32)
        if (block_samples - 1) % 8:
            raise ValueError("WAV: block_samples-1 must be a multiple of 8")
        blocks = []
        index = 0
        for start in range(0, n, block_samples):
            chunk = pcm[start : start + block_samples]
            blk, index = _ima_wav_encode_block(chunk, len(chunk), index)
            blocks.append(blk)
        body = b"".join(blocks)
        bits = 4
        block_align = 4 + (block_samples - 1 + 1) // 2
        fmt_extra = struct.pack("<HH", 2, block_samples)
    else:
        raise ValueError(f"WAV: unknown codec {codec!r}")
    fmt = struct.pack(
        "<HHIIHH", tag, ch, sample_rate,
        sample_rate * block_align, block_align, bits,
    ) + fmt_extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        chunks += b"\x00"
    chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """→ (float64 samples in [-1, 1], rate); (n,) mono or (n, ch)."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    fmt = None
    body = None
    n_declared = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) < ln:
            raise ValueError("WAV: truncated chunk")
        if tag == b"fmt ":
            fmt = payload
        elif tag == b"data":
            body = payload
        elif tag == b"fact" and ln >= 4:
            (n_declared,) = struct.unpack_from("<I", payload, 0)
        pos += 8 + ln + (ln & 1)
    if fmt is None or body is None:
        raise ValueError("WAV: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV: short fmt chunk")
    tag, ch, rate, _bps, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if ch < 1 or ch > 8 or rate < 1:
        raise ValueError("WAV: bad channel count / rate")
    if tag == 1 and bits == 16:
        out = np.frombuffer(body, "<i2").astype(np.float64) / 32768.0
    elif tag == 1 and bits == 8:
        out = (np.frombuffer(body, np.uint8).astype(np.float64) - 128) / 128.0
    elif tag == 6:
        out = _alaw_decode(np.frombuffer(body, np.uint8)) / 32768.0
    elif tag == 7:
        out = _ulaw_decode(np.frombuffer(body, np.uint8)) / 32768.0
    elif tag == 0x11:
        if ch != 1:
            raise ValueError("WAV: IMA ADPCM decoder is mono-only")
        if len(fmt) < 20:
            raise ValueError("WAV: IMA fmt missing samples-per-block")
        (block_samples,) = struct.unpack_from("<H", fmt, 18)
        if block_samples < 1 or block_align < 5:
            raise ValueError("WAV: bad IMA framing")
        chunks = []
        total = n_declared
        got = 0
        for start in range(0, len(body), block_align):
            block = body[start : start + block_align]
            if len(block) < 4:
                break
            want = block_samples
            if total is not None:
                want = min(want, total - got)
                if want <= 0:
                    break
            # a short final block carries fewer samples than declared
            avail = 1 + (len(block) - 4) * 2
            want = min(want, avail)
            chunks.append(_ima_wav_decode_block(block, want))
            got += want
        out = (
            np.concatenate(chunks).astype(np.float64) / 32768.0
            if chunks
            else np.zeros(0, np.float64)
        )
        return out, rate
    elif tag == 2:
        raise ValueError("WAV: MS-ADPCM (tag 2) not supported")
    else:
        raise ValueError(f"WAV: format tag {tag} not supported")
    if ch > 1:
        usable = (len(out) // ch) * ch
        out = out[:usable].reshape(-1, ch)
    if n_declared is not None and tag != 1:
        out = out[:n_declared]
    return out, rate


# --------------------------------------------------------------------------
# AIFF container (big-endian PCM)
# --------------------------------------------------------------------------


def _ext80_pack(rate: float) -> bytes:
    """IEEE 754 80-bit extended float (sign+15-bit exponent, 64-bit
    mantissa with explicit integer bit) — AIFF sample-rate encoding."""
    if rate <= 0:
        raise ValueError("AIFF: rate must be positive")
    exp = 0
    mant = rate
    while mant >= 2.0:
        mant /= 2.0
        exp += 1
    while mant < 1.0:
        mant *= 2.0
        exp -= 1
    mant_bits = int(mant * (1 << 63))
    return struct.pack(">HQ", (exp + 16383) & 0x7FFF, mant_bits)


def _ext80_unpack(b: bytes) -> float:
    se, mant = struct.unpack(">HQ", b)
    exp = (se & 0x7FFF) - 16383
    if mant == 0:
        return 0.0
    val = mant / float(1 << 63) * (2.0 ** exp)
    return -val if se & 0x8000 else val


def encode_aiff(samples: np.ndarray, sample_rate: int = 8000, bits: int = 16) -> bytes:
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if bits == 16:
        body = (np.clip(x, -1, 1) * 32767).astype(">i2").tobytes()
    elif bits == 8:
        body = (np.clip(x, -1, 1) * 127).astype(np.int8).tobytes()
    else:
        raise ValueError("AIFF: 8/16-bit only")
    comm = struct.pack(">hIh", ch, n, bits) + _ext80_pack(float(sample_rate))
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF file")
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from(">I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) < ln:
            raise ValueError("AIFF: truncated chunk")
        if tag == b"COMM":
            comm = payload
        elif tag == b"SSND":
            ssnd = payload
        pos += 8 + ln + (ln & 1)
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise ValueError("AIFF: missing COMM/SSND")
    ch, n, bits = struct.unpack_from(">hIh", comm, 0)
    rate = int(round(_ext80_unpack(comm[8:18])))
    if ch < 1 or ch > 8 or rate < 1 or bits not in (8, 16):
        raise ValueError("AIFF: unsupported COMM shape")
    offset, _blk = struct.unpack_from(">II", ssnd, 0)
    body = ssnd[8 + offset :]
    if bits == 16:
        out = np.frombuffer(body, ">i2").astype(np.float64) / 32768.0
    else:
        out = np.frombuffer(body, np.int8).astype(np.float64) / 128.0
    usable = min(len(out), n * ch) // ch * ch
    out = out[:usable]
    if ch > 1:
        out = out.reshape(-1, ch)
    return out, rate
