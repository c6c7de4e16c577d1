"""Multimodal column stages — image/audio as opaque binary + typed metadata.

The decode kernels themselves are STUBS (no image/audio libraries in this
container): each stage tries the real library at actor init and otherwise
falls back to a deterministic fake codec, clearly marked. What IS real and
tested is the Ray-side plumbing the 100 TB design needs: binary columns
travel as Arrow ``binary`` (never pandas object dtype), stages are
actor-pool ``map_batches`` callables with per-actor init, batch sizes stay
small because each row is large, and outputs keep (id, metadata, payload)
columns so downstream stages compose.

Fake payload format (for fixtures/tests):
    b"FAKEIMG" + height:uint16 + width:uint16 + channels:uint8 + pixel bytes
    b"FAKEAUD" + sample_rate:uint32 + n_samples:uint32 + int16 samples
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

IMG_MAGIC = b"FAKEIMG"
AUD_MAGIC = b"FAKEAUD"
VID_MAGIC = b"FAKEVID"

# Deterministic synthetic-image law (PARITY SOURCE — the oracle SQL in
# oracle_queries._multimodal_image_stats_sql is generated from these):
#   height   = SYNTH_H_BASE + doc_id % SYNTH_H_MOD
#   width    = SYNTH_W_BASE + doc_id % SYNTH_W_MOD
#   channels = 1 + doc_id % SYNTH_C_MOD
#   pixel[i] = (doc_id*SYNTH_PX_A + i*(1 + doc_id % SYNTH_STEP_MOD)) % 256
# so the image STATS an actual decode produces are SQL-expressible while
# the payload still travels as a real Arrow binary column through a real
# actor-pool decode stage.
SYNTH_H_BASE, SYNTH_H_MOD = 4, 13
SYNTH_W_BASE, SYNTH_W_MOD = 4, 11
SYNTH_C_MOD = 3
SYNTH_PX_A = 2654435761          # Knuth multiplicative-hash constant
SYNTH_STEP_MOD = 7

# Deterministic synthetic-audio law (PARITY SOURCE — the oracle SQL in
# oracle_queries._multimodal_audio_stats_sql is generated from these):
#   sample_rate = AUD_RATE_BASE + (doc_id % AUD_RATE_MOD) * AUD_RATE_STEP
#   n_samples   = AUD_N_BASE + doc_id % AUD_N_MOD
#   sample[i]   = ((doc_id*SYNTH_PX_A + i*(1 + doc_id % SYNTH_STEP_MOD))
#                  % 65536) - 32768   (int16 range by construction)
AUD_RATE_BASE, AUD_RATE_MOD, AUD_RATE_STEP = 8000, 3, 4000
AUD_N_BASE, AUD_N_MOD = 64, 101

# Deterministic synthetic-video law (PARITY SOURCE — the oracle SQL in
# oracle_queries._multimodal_video_frames_sql is generated from these):
#   n_frames = VID_N_BASE + doc_id % VID_N_MOD
#   height   = VID_H_BASE + doc_id % VID_H_MOD
#   width    = VID_W_BASE + doc_id % VID_W_MOD
#   pixel[i] (flat over n_frames·h·w, row-major frame-then-pixel)
#            = (doc_id*SYNTH_PX_A + i*(1 + doc_id % SYNTH_STEP_MOD)) % 256
# Frames are single-channel; VideoFrameSampleStage keeps every
# VID_SAMPLE_K-th frame.
VID_N_BASE, VID_N_MOD = 6, 17
VID_H_BASE, VID_H_MOD = 3, 5
VID_W_BASE, VID_W_MOD = 3, 6
VID_SAMPLE_K = 4


def fake_image(height: int, width: int, channels: int = 3, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, height * width * channels, dtype=np.uint8)
    return IMG_MAGIC + struct.pack("<HHB", height, width, channels) + pixels.tobytes()


def fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, n_samples, dtype=np.int16)
    return AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


def fake_video(n_frames: int, height: int, width: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, n_frames * height * width, dtype=np.uint8)
    return (VID_MAGIC + struct.pack("<IHH", n_frames, height, width)
            + frames.tobytes())


# --- pure-numpy real-format codecs (BMP, WAV/PCM16) ---------------------------
# One REAL image and audio container each, decodable without PIL/soundfile
# (absent from this sandbox), so the stages' real-format branch is testable:
# uncompressed 24-bit bottom-up BI_RGB BMP and RIFF/WAVE PCM16. Encoders
# exist for round-trip tests only.

def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    body = rows.tobytes()
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB. Pure numpy;
    raises NotImplementedError for any other BMP flavor (paletted,
    compressed, top-down) so unexpected payloads fail loudly."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if size < 40 or bpp != 24 or comp != 0 or h <= 0:
        raise NotImplementedError(
            "only uncompressed 24-bit bottom-up BMP is supported"
        )
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, offset=off,
                         count=h * stride).reshape(h, stride)
    return rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # unflip + RGB


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """1-D int16 samples → RIFF/WAVE PCM16 mono."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    body = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, flat int16 samples across channels).
    Pure numpy chunk walk; raises NotImplementedError for non-PCM16."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"fmt ":
            afmt, _ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, pos + 8
            )
            if afmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is supported")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", offset=pos + 8,
                                    count=clen // 2)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), samples


class VideoFrameSampleStage:
    """binary video → every k-th frame re-encoded as FAKEIMG rows
    (1 input row → ⌈n_frames/k⌉ output rows: the explode-shaped stage a
    frame-level pipeline needs). Real decoding would use pyav/ffmpeg —
    absent here, so only the FAKEVID container is decoded; anything else
    raises NotImplementedError."""

    def __init__(self, every_k: int = 10, video_col: str = "video"):
        self.k, self.video_col = every_k, video_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, images = [], [], []
        id_col = "id" if "id" in batch.column_names else batch.column_names[0]
        for rid, data in zip(batch[id_col].to_pylist(),
                             batch[self.video_col].to_pylist()):
            if data[: len(VID_MAGIC)] != VID_MAGIC:
                raise NotImplementedError("real video decode requires pyav")
            n, h, w = struct.unpack_from("<IHH", data, len(VID_MAGIC))
            px = np.frombuffer(
                data, dtype=np.uint8, offset=len(VID_MAGIC) + 8
            ).reshape(n, h, w)
            for i in range(0, n, self.k):
                ids.append(rid)
                frame_idx.append(i)
                images.append(
                    IMG_MAGIC + struct.pack("<HHB", h, w, 1)
                    + px[i].tobytes()
                )
        return pa.table(
            {
                id_col: pa.array(ids),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "image": pa.array(images, type=pa.binary()),
            }
        )


class ImageDecodeStage:
    """binary image column → (height, width, channels, mean_intensity).

    Real path (``pillow`` present) decodes actual images; otherwise the
    deterministic fake codec parses the FAKEIMG header. Use
    ``batch_size≈64`` and ``concurrency=(n, m)``: rows are megabytes, so a
    batch × pool must fit worker heaps (SURVEY §4 memory note).
    """

    def __init__(self, image_col: str = "image"):
        self.image_col = image_col
        try:  # pragma: no cover - library absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, data: bytes) -> tuple[int, int, int, float]:
        if data[: len(IMG_MAGIC)] == IMG_MAGIC:
            h, w, c = struct.unpack_from("<HHB", data, len(IMG_MAGIC))
            px = np.frombuffer(data, dtype=np.uint8,
                               offset=len(IMG_MAGIC) + 5, count=h * w * c)
            return h, w, c, float(px.mean())
        if data[:2] == b"BM":          # real format, pure-numpy path
            arr = decode_bmp(data)
            return arr.shape[0], arr.shape[1], 3, float(arr.mean())
        if self._pil is not None:  # pragma: no cover
            import io

            img = self._pil.open(io.BytesIO(data))
            arr = np.asarray(img)
            return arr.shape[0], arr.shape[1], (arr.shape[2] if arr.ndim == 3 else 1), float(arr.mean())
        raise NotImplementedError(
            "real image decoding requires pillow; payload is not FAKEIMG"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self._decode(v) for v in batch[self.image_col].to_pylist()]
        h, w, c, m = zip(*vals) if vals else ((), (), (), ())
        batch = batch.drop_columns([self.image_col])
        return (
            batch.append_column("height", pa.array(h, type=pa.int32()))
            .append_column("width", pa.array(w, type=pa.int32()))
            .append_column("channels", pa.array(c, type=pa.int32()))
            .append_column("mean_intensity", pa.array(m, type=pa.float64()))
        )


def synth_images(batch: pa.Table) -> pa.Table:
    """doc_id → deterministic FAKEIMG payload per the SYNTH_* law. Pixel
    generation is one flat numpy pass for the whole batch (the per-row
    Python is only header packing + buffer slicing)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = SYNTH_H_BASE + ids % SYNTH_H_MOD
    w = SYNTH_W_BASE + ids % SYNTH_W_MOD
    c = 1 + ids % SYNTH_C_MOD
    base = (ids * SYNTH_PX_A) % 256
    step = 1 + ids % SYNTH_STEP_MOD
    n = h * w * c
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    i = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
    px = ((np.repeat(base, n) + i * np.repeat(step, n)) % 256).astype(
        np.uint8
    )
    payloads = [
        IMG_MAGIC + struct.pack("<HHB", h[j], w[j], c[j])
        + px[starts[j]:starts[j] + n[j]].tobytes()
        for j in range(len(ids))
    ]
    return pa.table(
        {"doc_id": batch["doc_id"],
         "image": pa.array(payloads, type=pa.binary())}
    )


class ImageStatsStage:
    """binary image → (height, width, channels, n_px, px_sum) — the
    decode-and-featurize stage with ALL-INTEGER outputs so the result is
    oracle-checkable. Real path (``pillow`` present) decodes actual
    images; the deterministic fake codec parses the FAKEIMG header. Run as
    an actor pool (map_batches with the class): rows can be megabytes, so
    batch_size stays small and init happens once per actor."""

    def __init__(self, image_col: str = "image"):
        self.image_col = image_col
        try:  # pragma: no cover - library absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _stats(self, data: bytes) -> tuple[int, int, int, int, int]:
        if data[: len(IMG_MAGIC)] == IMG_MAGIC:
            h, w, c = struct.unpack_from("<HHB", data, len(IMG_MAGIC))
            px = np.frombuffer(data, dtype=np.uint8,
                               offset=len(IMG_MAGIC) + 5, count=h * w * c)
            return h, w, c, h * w * c, int(px.sum(dtype=np.int64))
        if data[:2] == b"BM":          # real format, pure-numpy path
            arr = decode_bmp(data)
            return (arr.shape[0], arr.shape[1], 3, arr.size,
                    int(arr.sum(dtype=np.int64)))
        if self._pil is not None:  # pragma: no cover
            import io

            arr = np.asarray(self._pil.open(io.BytesIO(data)))
            c = arr.shape[2] if arr.ndim == 3 else 1
            return (arr.shape[0], arr.shape[1], c, arr.size,
                    int(arr.sum(dtype=np.int64)))
        raise NotImplementedError(
            "real image decoding requires pillow; payload is not FAKEIMG"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self._stats(v) for v in batch[self.image_col].to_pylist()]
        h, w, c, n, s = zip(*vals) if vals else ((), (), (), (), ())
        batch = batch.drop_columns([self.image_col])
        for name, col in (("height", h), ("width", w), ("channels", c),
                          ("n_px", n), ("px_sum", s)):
            batch = batch.append_column(name, pa.array(col, type=pa.int64()))
        return batch


class ImageResizeStage:
    """binary image → binary image at (target_h, target_w). Fake codec does
    nearest-neighbour on the FAKEIMG pixel grid — deterministic, so the
    output bytes are testable."""

    def __init__(self, target_h: int, target_w: int, image_col: str = "image"):
        self.th, self.tw, self.image_col = target_h, target_w, image_col

    def _resize(self, data: bytes) -> bytes:
        if data[: len(IMG_MAGIC)] != IMG_MAGIC:
            raise NotImplementedError("real resize requires pillow")
        h, w, c = struct.unpack_from("<HHB", data, len(IMG_MAGIC))
        px = np.frombuffer(data, dtype=np.uint8,
                           offset=len(IMG_MAGIC) + 5).reshape(h, w, c)
        ri = (np.arange(self.th) * h // self.th)
        ci = (np.arange(self.tw) * w // self.tw)
        out = px[ri][:, ci]
        return (IMG_MAGIC + struct.pack("<HHB", self.th, self.tw, c)
                + out.tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [self._resize(v) for v in batch[self.image_col].to_pylist()]
        idx = batch.schema.get_field_index(self.image_col)
        return batch.set_column(
            idx, self.image_col, pa.array(resized, type=pa.binary())
        )


def synth_audio(batch: pa.Table) -> pa.Table:
    """doc_id → deterministic FAKEAUD payload per the AUD_* law. Sample
    generation is one flat numpy pass for the whole batch (the per-row
    Python is only header packing + buffer slicing)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rate = AUD_RATE_BASE + (ids % AUD_RATE_MOD) * AUD_RATE_STEP
    n = AUD_N_BASE + ids % AUD_N_MOD
    base = ids * SYNTH_PX_A
    step = 1 + ids % SYNTH_STEP_MOD
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    i = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
    s = (((np.repeat(base, n) + i * np.repeat(step, n)) % 65536) - 32768
         ).astype(np.int16)
    payloads = [
        AUD_MAGIC + struct.pack("<II", rate[j], n[j])
        + s[starts[j]:starts[j] + n[j]].tobytes()
        for j in range(len(ids))
    ]
    return pa.table(
        {"doc_id": batch["doc_id"],
         "audio": pa.array(payloads, type=pa.binary())}
    )


def synth_videos(batch: pa.Table) -> pa.Table:
    """doc_id → deterministic FAKEVID payload per the VID_* law. Pixel
    generation is one flat numpy pass for the whole batch (the per-row
    Python is only header packing + buffer slicing)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nf = VID_N_BASE + ids % VID_N_MOD
    h = VID_H_BASE + ids % VID_H_MOD
    w = VID_W_BASE + ids % VID_W_MOD
    base = (ids * SYNTH_PX_A) % 256
    step = 1 + ids % SYNTH_STEP_MOD
    n = nf * h * w
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    i = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
    px = ((np.repeat(base, n) + i * np.repeat(step, n)) % 256).astype(
        np.uint8
    )
    payloads = [
        VID_MAGIC + struct.pack("<IHH", nf[j], h[j], w[j])
        + px[starts[j]:starts[j] + n[j]].tobytes()
        for j in range(len(ids))
    ]
    return pa.table(
        {"doc_id": batch["doc_id"],
         "video": pa.array(payloads, type=pa.binary())}
    )


class AudioStatsStage:
    """binary audio → (sample_rate, n_samples, s_sum, s_sqsum) — the
    decode-and-featurize stage with ALL-INTEGER outputs so the result is
    oracle-checkable. Real path (``soundfile`` present) decodes actual
    audio; the deterministic fake codec parses the FAKEAUD header."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col
        try:  # pragma: no cover - library absent in this container
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _stats(self, data: bytes) -> tuple[int, int, int, int]:
        if data[: len(AUD_MAGIC)] == AUD_MAGIC:
            rate, n = struct.unpack_from("<II", data, len(AUD_MAGIC))
            s = np.frombuffer(data, dtype=np.int16,
                              offset=len(AUD_MAGIC) + 8, count=n
                              ).astype(np.int64)
            return rate, n, int(s.sum()), int((s * s).sum())
        if data[:4] == b"RIFF":        # real format, pure-numpy path
            rate, s = decode_wav(data)
            s = s.astype(np.int64)
            return rate, len(s), int(s.sum()), int((s * s).sum())
        if self._sf is not None:  # pragma: no cover
            import io

            s, rate = self._sf.read(io.BytesIO(data), dtype="int16")
            s = np.asarray(s, dtype=np.int64).ravel()
            return int(rate), len(s), int(s.sum()), int((s * s).sum())
        raise NotImplementedError(
            "real audio decoding requires soundfile; payload is not FAKEAUD"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self._stats(v) for v in batch[self.audio_col].to_pylist()]
        r, n, ss, sq = zip(*vals) if vals else ((), (), (), ())
        batch = batch.drop_columns([self.audio_col])
        for name, col in (("sample_rate", r), ("n_samples", n),
                          ("s_sum", ss), ("s_sqsum", sq)):
            batch = batch.append_column(name, pa.array(col, type=pa.int64()))
        return batch


class AudioFrameStage:
    """binary audio → fixed-length frame features: split int16 samples into
    ``frame_len`` windows, emit per-row (n_frames, rms list<float32>)."""

    def __init__(self, frame_len: int = 1024, audio_col: str = "audio"):
        self.frame_len, self.audio_col = frame_len, audio_col

    def _frames(self, data: bytes) -> np.ndarray:
        if data[:4] == b"RIFF":        # real format, pure-numpy path
            _rate, samples = decode_wav(data)
        elif data[: len(AUD_MAGIC)] == AUD_MAGIC:
            rate, n = struct.unpack_from("<II", data, len(AUD_MAGIC))
            samples = np.frombuffer(data, dtype=np.int16,
                                    offset=len(AUD_MAGIC) + 8, count=n)
        else:
            raise NotImplementedError("real audio decode requires soundfile")
        usable = (len(samples) // self.frame_len) * self.frame_len
        if usable == 0:
            return np.zeros(0, dtype=np.float32)
        frames = samples[:usable].reshape(-1, self.frame_len).astype(np.float64)
        return np.sqrt((frames**2).mean(axis=1)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms = [self._frames(v) for v in batch[self.audio_col].to_pylist()]
        batch = batch.drop_columns([self.audio_col])
        return (
            batch.append_column(
                "n_frames", pa.array([len(r) for r in rms], type=pa.int32())
            ).append_column(
                "frame_rms",
                pa.array([r.tolist() for r in rms], type=pa.list_(pa.float32())),
            )
        )
