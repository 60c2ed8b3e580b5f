"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

Codec strategy: real decoders (``PIL`` for images, ``soundfile`` for audio)
are used WHEN IMPORTABLE (this container ships neither); a deterministic
fake codec (``FAKEIMG:<w>x<h>:`` / ``FAKEAUD:<sr>:<n>:`` headers) is the
tested oracle path and exercises the REAL Ray-side plumbing — schema,
actor-pool signature, batch sizing, binary-through-Arrow layout — end to
end.  Undecodable payloads emit typed zero rows (schema stability over
failing the block).

Batch-size guidance: large binary payloads ⇒ small ``batch_size`` (32-128) so
batch × concurrency fits worker heap; keep ``batch_format="pyarrow"`` (binary
round-trips zero-copy through Arrow, NOT through pandas).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # pragma: no cover - not present in this container
    import soundfile  # noqa: F401

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("mean_luma", pa.float64()),
    ]
)


def fake_image(item_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image payload."""
    rng = np.random.RandomState(item_id)
    pixels = rng.randint(0, 256, size=width * height, dtype=np.uint8)
    return f"FAKEIMG:{width}x{height}:".encode() + pixels.tobytes()


def _decode_fake(payload: bytes):
    if not payload.startswith(b"FAKEIMG:"):
        return None
    head, _, rest = payload.partition(b":")
    dims, _, pixels = payload[len(b"FAKEIMG:") :].partition(b":")
    w, h = (int(x) for x in dims.decode().split("x"))
    return w, h, np.frombuffer(pixels, dtype=np.uint8)


def _decode_real(payload: bytes):
    """Real codec path (PIL, when importable): decode → grayscale pixel
    array.  Returns None on undecodable bytes — the stage emits a typed
    zero row rather than failing the block."""
    import io

    try:
        img = Image.open(io.BytesIO(payload))
        img.load()
        gray = img.convert("L")
        return img.width, img.height, np.asarray(gray, dtype=np.uint8).ravel()
    except Exception:
        return None


class ImageDecode:
    """Actor-pool stage: binary → (width, height, n_bytes, mean_luma).

    Real decode (PIL) is gated behind the import; the fake codec keeps the
    pipeline testable and deterministic."""

    def __init__(self, binary_column: str = "data", id_column: str = "item_id"):
        self.binary_column = binary_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.binary_column).to_pylist()
        widths, heights, sizes, lumas = [], [], [], []
        for p in payloads:
            decoded = _decode_fake(p or b"")
            if decoded is None:
                real = _decode_real(p or b"") if _HAVE_PIL else None
                if real is None:
                    # unknown payload and no codec — typed zero row, the
                    # batch keeps flowing (schema stability over raising)
                    widths.append(0)
                    heights.append(0)
                    sizes.append(len(p or b""))
                    lumas.append(0.0)
                    continue
                decoded = real
            w, h, px = decoded
            widths.append(w)
            heights.append(h)
            sizes.append(len(p))
            lumas.append(float(px.mean()) if px.size else 0.0)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "mean_luma": pa.array(lumas, pa.float64()),
            }
        )


class ImageResize:
    """Actor-pool stage: nearest-neighbor resize of the fake codec payloads
    (shape plumbing for the real kernel)."""

    def __init__(self, target: tuple[int, int] = (8, 8), binary_column: str = "data",
                 id_column: str = "item_id"):
        self.target = target
        self.binary_column = binary_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.binary_column).to_pylist()
        tw, th = self.target
        out = []
        for p in payloads:
            decoded = _decode_fake(p or b"")
            if decoded is None:
                out.append(b"")
                continue
            w, h, px = decoded
            img = px.reshape(h, w)
            ys = (np.arange(th) * h // th).clip(0, h - 1)
            xs = (np.arange(tw) * w // tw).clip(0, w - 1)
            resized = img[np.ix_(ys, xs)]
            out.append(f"FAKEIMG:{tw}x{th}:".encode() + resized.tobytes())
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "data": pa.array(out, pa.binary()),
            }
        )


def fake_video(frames: list[bytes]) -> bytes:
    """Fake video container: ``FAKEVID:`` + per frame a 4-byte big-endian
    length prefix + the frame payload (binary-safe — frame bytes are
    arbitrary, unlike a separator-based container)."""
    out = [b"FAKEVID:"]
    for f in frames:
        out.append(len(f).to_bytes(4, "big"))
        out.append(f)
    return b"".join(out)


class FrameSampler:
    """Video frame sampling stub: parses the length-prefixed ``FAKEVID``
    container and emits every ``stride``-th frame as its own row (flat-map
    shape: one input row → N output rows).  Real codecs (pyav etc.) would
    replace only the container walk; the Ray-side shape is the real thing."""

    def __init__(self, stride: int = 2, binary_column: str = "data", id_column: str = "item_id"):
        self.stride = stride
        self.binary_column = binary_column
        self.id_column = id_column

    @staticmethod
    def _frames(payload: bytes) -> list[bytes]:
        if not payload.startswith(b"FAKEVID:"):
            return []
        frames, pos = [], len(b"FAKEVID:")
        while pos + 4 <= len(payload):
            n = int.from_bytes(payload[pos : pos + 4], "big")
            pos += 4
            frames.append(payload[pos : pos + n])
            pos += n
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.binary_column).to_pylist()
        out_ids, out_frames, out_data = [], [], []
        for item_id, p in zip(ids, payloads):
            frames = self._frames(p or b"")
            for fi in range(0, len(frames), self.stride):
                out_ids.append(item_id)
                out_frames.append(fi)
                out_data.append(frames[fi])
        return pa.table(
            {
                "item_id": pa.array(out_ids, pa.int64()),
                "frame_index": pa.array(out_frames, pa.int32()),
                "data": pa.array(out_data, pa.binary()),
            }
        )


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def fake_audio(item_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic fake audio payload: ``FAKEAUD:<sr>:<n>:`` + int16 PCM."""
    rng = np.random.RandomState(item_id ^ 0xA0D10)
    samples = rng.randint(-(1 << 14), 1 << 14, size=n_samples, dtype=np.int16)
    return f"FAKEAUD:{sample_rate}:{n_samples}:".encode() + samples.tobytes()


def _decode_fake_audio(payload: bytes):
    if not payload.startswith(b"FAKEAUD:"):
        return None
    rest = payload[len(b"FAKEAUD:") :]
    sr_b, _, rest = rest.partition(b":")
    n_b, _, pcm = rest.partition(b":")
    sr, n = int(sr_b), int(n_b)
    return sr, np.frombuffer(pcm, dtype=np.int16)[:n]


def _decode_real_audio(payload: bytes):
    """Real codec path (soundfile, when importable)."""
    import io

    try:
        data, sr = soundfile.read(io.BytesIO(payload), dtype="int16")
        if data.ndim > 1:
            data = data.mean(axis=1).astype(np.int16)
        return sr, data
    except Exception:
        return None


class AudioDecode:
    """Actor-pool stage: binary → (sample_rate, n_samples, duration_s, rms).

    Same shape contract as :class:`ImageDecode`: the deterministic fake
    codec is the tested path; soundfile decodes real payloads when the
    library is importable; undecodable bytes emit a typed zero row."""

    def __init__(self, binary_column: str = "data", id_column: str = "item_id"):
        self.binary_column = binary_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        payloads = batch.column(self.binary_column).to_pylist()
        srs, counts, durs, rms = [], [], [], []
        for p in payloads:
            decoded = _decode_fake_audio(p or b"")
            if decoded is None and _HAVE_SOUNDFILE:
                decoded = _decode_real_audio(p or b"")
            if decoded is None:
                srs.append(0)
                counts.append(0)
                durs.append(0.0)
                rms.append(0.0)
                continue
            sr, samples = decoded
            srs.append(sr)
            counts.append(int(samples.size))
            durs.append(samples.size / sr if sr else 0.0)
            rms.append(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if samples.size else 0.0)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int32()),
                "n_samples": pa.array(counts, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
            }
        )
