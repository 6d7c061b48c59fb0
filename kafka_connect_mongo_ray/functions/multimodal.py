"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns
beside a metadata struct (mime, width/height or sample rate, ...).
Two REAL pure-Python/numpy codecs are implemented — PPM (P6) images
and PCM-16 WAV audio, both fully parseable without external codec
libraries — as actor-pool ``map_batches`` stages. Formats that would
need a native codec (JPEG/PNG/MP4...) remain behind ``DecodeStub``
with an explicit NotImplementedError; its deterministic fake keeps
the plumbing testable.

At 100 TB these stages are exactly where ``batch_size`` must shrink
(large binary payloads: a batch × concurrency must fit the worker
heap) — callers should pass ``batch_size≈32-256`` and
``batch_format='pyarrow'`` (binary columns do not round-trip pandas).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("meta_json", pa.string()),
    ]
)


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    ``fake=True`` (default here) produces a deterministic feature
    vector from the payload bytes (blake2b-seeded), so tests exercise
    the full pipeline; ``fake=False`` raises NotImplementedError where
    a real codec (PIL / torchaudio / pyav) would be invoked.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = True,
                 payload_col: str = "payload"):
        self.feature_dim = feature_dim
        self.fake = fake
        self.payload_col = payload_col

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires codec libraries not present in "
                "this environment; run with fake=True for the plumbing path"
            )
        seed = int.from_bytes(
            hashlib.blake2b(payload or b"", digest_size=8).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch[self.payload_col].to_pylist()]
        m = np.stack(feats)
        return batch.drop_columns([self.payload_col]).append_column(
            "features", pa.array(list(m), pa.list_(pa.float32(), self.feature_dim))
        )


# ---------------------------------------------------------------------------
# REAL codecs (pure numpy — no external libraries)


def encode_ppm(width: int, height: int, value: int) -> bytes:
    """Minimal P6 PPM writer: solid-color RGB image of ``value``."""
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes([value % 256]) * (width * height * 3)


def encode_ppm_pixels(pixels: np.ndarray) -> bytes:
    """P6 PPM writer for an arbitrary (h, w, 3) uint8 pixel plane."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM requires 3 channels")
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_ppm_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary P6 PPM to its full pixel plane: returns
    (width, height, pixels[h, w, 3] uint8).

    Real parser: handles the whitespace-separated header grammar
    including ``#`` comments, validates maxval, reads the pixel plane
    with numpy. Raises ValueError on malformed input."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header tokens: magic, width, height, maxval — whitespace separated,
    # comments run # → end of line
    tokens: list[bytes] = []
    i = 2
    n = len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    i += 1  # single whitespace byte after maxval
    pixels = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3,
                           offset=i)
    if pixels.size != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels.reshape(height, width, 3)


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """Parse a binary P6 PPM: returns (width, height, mean_pixel)."""
    width, height, pixels = decode_ppm_pixels(payload)
    return width, height, float(pixels.mean())


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) plane to (out_h, out_w, 3).

    Output pixel (X, Y) samples input (floor(X*w/out_w), floor(Y*h/out_h))
    — the standard integer nearest mapping, fully vectorized as two
    fancy-index gathers. Works for both down- and up-scaling."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[rows][:, cols]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE writer: mono PCM-16."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, int, int]:
    """Parse RIFF/WAVE mono PCM-16 by walking the chunk list: returns
    (sample_rate, n_samples, duration_us, max_abs_amplitude)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    sample_rate = None
    data = None
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack(
                "<HHI", payload[i + 8:i + 16])
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only mono PCM supported")
        elif cid == b"data":
            data = payload[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    dur_us = len(samples) * 1_000_000 // sample_rate
    max_amp = int(np.abs(samples.astype(np.int32)).max()) if len(samples) else 0
    return sample_rate, len(samples), dur_us, max_amp


class PpmDecoder:
    """Actor-pool image decode stage over a PPM ``binary`` payload
    column: emits width / height / n_pixels / mean_pixel per row.
    Malformed payloads are skipped and counted (the engine's standing
    malformed-record contract)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.malformed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, means = [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            try:
                w, h, mean = decode_ppm(p or b"")
            except ValueError:
                self.malformed += 1
                continue
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            means.append(mean)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_pixels": pa.array([w * h for w, h in zip(ws, hs)], pa.int64()),
                "mean_pixel": pa.array(means, pa.float64()),
            }
        )


class WavDecoder:
    """Actor-pool audio decode stage over a PCM-16 WAV payload column:
    emits sample_rate / n_samples / duration_us / max_amp per row."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.malformed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rates, ns, durs, amps = [], [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            try:
                rate, n, dur, amp = decode_wav_pcm16(p or b"")
            except ValueError:
                self.malformed += 1
                continue
            ids.append(mid)
            rates.append(rate)
            ns.append(n)
            durs.append(dur)
            amps.append(amp)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "duration_us": pa.array(durs, pa.int64()),
                "max_amp": pa.array(amps, pa.int64()),
            }
        )


class PpmResizer:
    """Actor-pool image RESIZE stage: decode the P6 PPM payload, resize
    the pixel plane to (out_w, out_h) with vectorized nearest-neighbor,
    re-encode as PPM. Emits the resized payload plus verification
    scalars (out dims, resized mean, payload length). Malformed inputs
    are skipped and counted.

    Resize was the canonical example of a per-record media transform in
    the task brief; at 100 TB this stage runs with a small batch_size
    so payload_bytes × batch × concurrency fits the worker heap."""

    def __init__(self, out_w: int = 4, out_h: int = 3,
                 payload_col: str = "payload", id_col: str = "media_id"):
        self.out_w = out_w
        self.out_h = out_h
        self.payload_col = payload_col
        self.id_col = id_col
        self.malformed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, means = [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            try:
                _, _, pixels = decode_ppm_pixels(p or b"")
            except ValueError:
                self.malformed += 1
                continue
            out = resize_nearest(pixels, self.out_w, self.out_h)
            ids.append(mid)
            payloads.append(encode_ppm_pixels(out))
            means.append(float(out.mean()))
        n = len(ids)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "out_width": pa.array([self.out_w] * n, pa.int64()),
                "out_height": pa.array([self.out_h] * n, pa.int64()),
                "resized_mean": pa.array(means, pa.float64()),
                "payload_bytes": pa.array([len(p) for p in payloads],
                                          pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


class AudioFeatureExtractor:
    """Actor-pool audio FEATURE-EXTRACT stage: decode the PCM-16 WAV
    payload and compute numpy signal features per clip — RMS energy,
    peak amplitude, and zero-crossing count (adjacent sample pairs
    whose product is negative). Malformed inputs skipped + counted."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.malformed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        ids, ns, rmss, peaks, zcs = [], [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            try:
                payload = p or b""
                if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE file")
                i, data = 12, None
                while i + 8 <= len(payload):
                    cid = payload[i:i + 4]
                    size = struct.unpack("<I", payload[i + 4:i + 8])[0]
                    if cid == b"data":
                        data = payload[i + 8:i + 8 + size]
                    i += 8 + size + (size & 1)
                if data is None:
                    raise ValueError("missing data chunk")
            except (ValueError, struct.error):
                self.malformed += 1
                continue
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            ids.append(mid)
            ns.append(len(s))
            rmss.append(float(np.sqrt((s * s).mean())) if len(s) else 0.0)
            peaks.append(int(np.abs(s).max()) if len(s) else 0)
            zcs.append(int((s[:-1] * s[1:] < 0).sum()) if len(s) > 1 else 0)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "rms": pa.array(rmss, pa.float64()),
                "peak": pa.array(peaks, pa.int64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
            }
        )


def encode_avi_rgb(frames: list[np.ndarray], width: int, height: int,
                   us_per_frame: int = 33_333) -> bytes:
    """Minimal RIFF/AVI writer: uncompressed RGB24 '00db' frames under
    one 'movi' list, a spec-shaped 'avih' main header and one 'strl'
    stream list. Enough structure for any chunk-walking reader."""
    import struct

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b"")

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    n = len(frames)
    frame_bytes = [np.ascontiguousarray(f, dtype=np.uint8).tobytes()
                   for f in frames]
    max_len = max((len(b) for b in frame_bytes), default=0)
    avih = struct.pack("<14I", us_per_frame, max_len * 8, 0, 0x10, n, 0, 1,
                       max_len, width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
                       us_per_frame, 1_000_000, 0, n, max_len, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse a RIFF/AVI container by walking its chunk tree: returns
    (width, height, n_frames, us_per_frame, frame_payloads) where
    frame_payloads are the raw '00db'/'00dc' video chunks in order.
    Raises ValueError on malformed input."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    header = None
    frames: list[bytes] = []

    def walk(buf: bytes, i: int, end: int) -> None:
        nonlocal header
        while i + 8 <= end:
            cid = buf[i:i + 4]
            size = struct.unpack("<I", buf[i + 4:i + 8])[0]
            if i + 8 + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(buf, i + 12, i + 8 + size)
            elif cid == b"avih":
                header = struct.unpack("<14I", buf[i + 8:i + 8 + 56])
            elif cid in (b"00db", b"00dc"):
                frames.append(buf[i + 8:i + 8 + size])
            i += 8 + size + (size & 1)

    walk(payload, 12, len(payload))
    if header is None:
        raise ValueError("missing avih header")
    us_per_frame, total_frames = header[0], header[4]
    width, height = header[8], header[9]
    if total_frames != len(frames):
        raise ValueError(
            f"avih declares {total_frames} frames, found {len(frames)}")
    return width, height, len(frames), us_per_frame, frames


class AviDecoder:
    """Actor-pool video decode stage: parses the AVI container, counts
    frames, and extracts the FIRST and LAST frame's mean pixel value —
    proving real frame extraction, not just header parsing. Malformed
    payloads are skipped and counted."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.malformed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, ns, durs, first, last = [], [], [], [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            try:
                w, h, n, upf, frames = decode_avi(p or b"")
                if n == 0:
                    raise ValueError("no frames")
            except ValueError:
                self.malformed += 1
                continue
            ids.append(mid)
            ws.append(w)
            hs.append(h)
            ns.append(n)
            durs.append(n * upf)
            first.append(float(np.frombuffer(frames[0], np.uint8).mean()))
            last.append(float(np.frombuffer(frames[-1], np.uint8).mean()))
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_frames": pa.array(ns, pa.int64()),
                "duration_us": pa.array(durs, pa.int64()),
                "mean_first_frame": pa.array(first, pa.float64()),
                "mean_last_frame": pa.array(last, pa.float64()),
            }
        )


class FrameSampler:
    """REAL frame sampler over AVI payloads — the flat_map-shaped
    (1 → N rows) multimodal stage: decodes the container and emits up
    to ``max_frames`` evenly-spaced frames per clip as
    (media_id, frame_idx, frame_mean, frame_bytes?) rows. Payload
    bytes are optional (``emit_bytes``) — at scale the downstream
    stage usually wants features, not raw frames."""

    def __init__(self, max_frames: int = 4, payload_col: str = "payload",
                 id_col: str = "media_id", emit_bytes: bool = False):
        self.max_frames = max_frames
        self.payload_col = payload_col
        self.id_col = id_col
        self.emit_bytes = emit_bytes
        self.malformed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, means, blobs = [], [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            try:
                _w, _h, n, _upf, frames = decode_avi(p or b"")
            except ValueError:
                self.malformed += 1
                continue
            k = min(self.max_frames, n)
            # integer-arithmetic even spacing (deduped, order kept) —
            # exactly reproducible in SQL, unlike np.linspace rounding
            if k <= 1:
                picks = [0] if n else []
            else:
                picks = list(dict.fromkeys(
                    j * (n - 1) // (k - 1) for j in range(k)))
            for fi in picks:
                ids.append(mid)
                idxs.append(int(fi))
                means.append(float(np.frombuffer(frames[fi], np.uint8).mean()))
                if self.emit_bytes:
                    blobs.append(frames[fi])
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_mean": pa.array(means, pa.float64()),
        }
        if self.emit_bytes:
            cols["frame_bytes"] = pa.array(blobs, pa.binary())
        return pa.table(cols)


class FrameSampleStub:
    """Video frame-sampling stub: emits ``frames_per_clip`` byte slices
    per payload (deterministic offsets), flat_map-shaped (1 → N rows)."""

    def __init__(self, frames_per_clip: int = 4, payload_col: str = "payload"):
        self.n = frames_per_clip
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch[self.payload_col].to_pylist()):
            p = p or b""
            step = max(1, len(p) // self.n)
            for f in range(self.n):
                ids.append(mid)
                idxs.append(f)
                frames.append(p[f * step:(f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )
