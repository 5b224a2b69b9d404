"""Multimodal plumbing: opaque binary payload columns + actor-pool
decode/feature stages. The decode kernels themselves are STUBBED (no
image/audio libraries in this container) behind a deterministic fake; the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested.

Reference analog: PIL verify + metadata extraction over downloaded image
files (``validator/integrity.py:454-542``, ``builder/_generator.py:864-894``).
Here the "media" is the corpus html payload treated as an opaque blob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pixcrawler_ray.extract import ahash64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("declared_bytes", pa.int64()),
])


def media_from_pages(pages_ds):
    """pages -> media table: html payloads as opaque blobs + typed metadata."""

    def conv(t: pa.Table) -> pa.Table:
        n = t.num_rows
        payload = t.column("html")
        sizes = pa.compute.binary_length(payload).cast(pa.int64())
        kinds = ("video", "image", "audio")
        mtypes = pa.array(
            [kinds[d % 3] for d in t.column("doc_id").to_pylist()],
            type=pa.string())
        return pa.table({
            "media_id": t.column("doc_id"),
            "payload": payload,
            "media_type": mtypes,
            "declared_bytes": sizes,
        })

    return pages_ds.map_batches(conv, batch_format="pyarrow")


def synthetic_media(sf_dir: str):
    """documents -> media rows with REAL container headers (png/gif/bmp/jpeg
    round-robin by doc_id) whose dimensions are doc_id arithmetic — so the
    header PARSER (functions/mediameta.py, the non-stub half of M11) is
    exercised on genuine bytes while staying SQL-replayable end-to-end."""
    from pixcrawler_ray.functions.mediameta import (
        encode_bmp_header, encode_gif_header, encode_jpeg_header,
        encode_png_header)
    from pixcrawler_ray.sources.readers import read_table

    encoders = (encode_png_header, encode_gif_header, encode_bmp_header,
                encode_jpeg_header)

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        payloads = [
            encoders[d % 4]((d % 640) + 1, (d % 480) + 1,
                            (x or "").encode()[:64])
            for d, x in zip(ids, texts)
        ]
        return pa.table({
            "media_id": t.column("doc_id"),
            "payload": pa.array(payloads, type=pa.binary()),
        })

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(build, batch_format="pyarrow")


def synthetic_audio(sf_dir: str):
    """documents -> REAL PCM16 WAV rows: a genuine 44-byte RIFF header
    (sample rate 8000 + (d%3)*4000, mono) followed by n = 64 + d % 64
    deterministic little-endian int16 samples s_i = ((d*37 + i*101) % 2048)
    - 1024 — arithmetic the SQL oracle replays, bytes the parser and the
    energy kernel must actually decode."""
    from pixcrawler_ray.functions.mediameta import encode_wav_header
    from pixcrawler_ray.sources.readers import read_table

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = []
        for d in ids:
            d = int(d)
            n = 64 + d % 64
            i = np.arange(n, dtype=np.int64)
            samples = ((d * 37 + i * 101) % 2048 - 1024).astype("<i2")
            payloads.append(encode_wav_header(8000 + (d % 3) * 4000, 1,
                                              samples.tobytes()))
        return pa.table({"media_id": t.column("doc_id"),
                         "payload": pa.array(payloads, type=pa.binary())})

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return ds.map_batches(build, batch_format="pyarrow")


def audio_frame_energy(audio_ds, frame: int = 16):
    """Framewise PCM energy (sum of squared int16 samples per ``frame``-
    sample window, full frames only) — the voice-activity-detection
    primitive, as a stateless batch kernel. The sample rate is parsed from
    the actual RIFF header bytes, the samples from the data chunk; energy
    sums are exact int64, so the stage is value-hash oracleable.

    Vectorized across the batch: one concatenated sample buffer, one
    squared cumsum, per-frame energies as cumsum differences.
    """

    def kernel(t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        arrs = [np.frombuffer(p, dtype="<i2", offset=44) for p in payloads]
        rates = [int.from_bytes(p[24:28], "little") for p in payloads]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        nf = lens // frame
        if nf.sum() == 0:
            return pa.table({"media_id": pa.array([], type=pa.int64()),
                             "sample_rate": pa.array([], type=pa.int64()),
                             "frame_idx": pa.array([], type=pa.int64()),
                             "energy": pa.array([], type=pa.int64())})
        data = (np.concatenate(arrs).astype(np.int64) if arrs
                else np.zeros(0, dtype=np.int64))
        cs = np.concatenate([[0], np.cumsum(data * data)])
        base = np.concatenate([[0], np.cumsum(lens)[:-1]])
        frame_idx = np.concatenate(
            [np.arange(k, dtype=np.int64) for k in nf])
        starts = np.repeat(base, nf) + frame_idx * frame
        energy = cs[starts + frame] - cs[starts]
        return pa.table({
            "media_id": pa.array(np.repeat(ids, nf)),
            "sample_rate": pa.array(np.repeat(
                np.asarray(rates, dtype=np.int64), nf)),
            "frame_idx": pa.array(frame_idx),
            "energy": pa.array(energy),
        })

    return audio_ds.map_batches(kernel, batch_format="pyarrow")


def sniff_metadata(media_ds, payload_col: str = "payload"):
    """Metadata-extraction stage: container format + dimensions parsed from
    raw header bytes (no decode, no image library — see mediameta.py).
    Task pool: the kernel is one numpy pass per batch, stateless."""
    from pixcrawler_ray.functions.mediameta import sniff_table

    return media_ds.map_batches(
        lambda t: sniff_table(t, payload_col), batch_format="pyarrow")


def _pil_image():
    """Optional-import hook (VERDICT r4 #5): PIL is the real decode path
    when present (the reference's `validator/integrity.py:454-542` analog:
    PIL verify + width/height/format); this container ships without it, so
    the deterministic fake is the documented fallback, not the design."""
    global _PIL_IMAGE
    if _PIL_IMAGE is _UNSET:
        try:
            from PIL import Image as _img
            _PIL_IMAGE = _img
        except ImportError:
            _PIL_IMAGE = None
    return _PIL_IMAGE


_UNSET = object()
_PIL_IMAGE = _UNSET


class FakeDecoder:
    """Actor-pool decode/feature stage.

    Decode resolution order per payload: (1) real PIL pixel decode when the
    library is importable AND the bytes are a complete image (``use_pil``
    auto-detects; pin ``use_pil=False`` for environment-independent
    determinism — the registry oracles do, since header-only synthetic
    payloads never fully decode anyway); (2) the deterministic fake kernel
    (byte stream tiled to a ``target_size``² luminance grid).
    ``strict=True`` raises NotImplementedError instead of (2) to mark the
    stub boundary explicitly.
    """

    def __init__(self, target_size: int = 32, strict: bool = False,
                 use_pil: bool | None = None):
        self.target = target_size
        self.strict = strict
        self.pil = _pil_image() if use_pil in (None, True) else None
        if use_pil and self.pil is None:
            raise ImportError("use_pil=True but PIL is not installed")
        # model-load slot: real impl loads a vision model here, once per actor

    def _pil_meta(self, payload: bytes):
        """(width, height, format) via PIL's LAZY open — header read only,
        no pixel load, so it succeeds on header-only payloads too (the
        reference's PIL ``verify()`` + dims check,
        ``validator/integrity.py:454-542``). None if PIL absent / not an
        image."""
        if self.pil is None or not payload:
            return None
        import io
        try:
            with self.pil.open(io.BytesIO(payload)) as im:
                return im.size[0], im.size[1], (im.format or "").lower()
        except Exception:
            return None

    def _pil_decode(self, payload: bytes):
        """(pixels, width, height) via PIL, or None if PIL is absent or the
        bytes are not a FULLY decodable image (header-only synthetics
        fall through to the fake kernel)."""
        if self.pil is None or not payload:
            return None
        import io
        try:
            with self.pil.open(io.BytesIO(payload)) as im:
                w, h = im.size
                arr = np.asarray(im.convert("L"), dtype=np.uint8)
            return arr, w, h
        except Exception:
            return None

    def _decode(self, payload: bytes) -> np.ndarray:
        got = self._pil_decode(payload)
        if got is not None:
            return got[0]
        # vendored pure-python PNG decode (functions/pngcodec.py): REAL
        # pixel decode with no image library — complete 8-bit gray/RGB
        # PNGs decode here; header-only synthetics return None and fall
        # through, so the fake-kernel oracle arithmetic is untouched
        from pixcrawler_ray.functions.pngcodec import decode_png
        png = decode_png(payload)
        if png is not None:
            arr = png[0]
            if arr.ndim == 3:
                # PIL 'L' fixed-point luminance (ImagingConvert L24:
                # (R*19595 + G*38470 + B*7471) >> 16) — bit-identical to
                # the PIL path so the decode is environment-independent
                a64 = arr.astype(np.int64)   # cast FIRST: 38470*uint8
                # silently wraps through uint16 under value-based casting
                arr = ((19595 * a64[:, :, 0] + 38470 * a64[:, :, 1]
                        + 7471 * a64[:, :, 2]) >> 16).astype(np.uint8)
            return arr
        if self.strict:
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg (not in this "
                "container); deterministic fake used when strict=False")
        # deterministic fake "decode": byte stream -> pseudo 2D luminance
        arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        side = self.target
        reps = int(np.ceil(side * side / max(1, len(arr))))
        return np.tile(arr, reps)[: side * side].reshape(side, side)

    def __call__(self, t: pa.Table) -> pa.Table:
        from pixcrawler_ray.functions.mediameta import sniff_dims

        payloads = t.column("payload").to_pylist()
        # REAL header metadata first (png/gif/bmp/jpeg/wav — no decode
        # needed); the stub decode only fills dimensions for payloads with
        # no recognizable container
        fmts, sniff_w, sniff_h = sniff_dims(payloads)
        feats, widths, heights, hashes, ok = [], [], [], [], []
        for i, payload in enumerate(payloads):
            try:
                img = self._decode(payload)
                feats.append([float(img.mean()), float(img.std()),
                              float(img.min()), float(img.max())])
                if fmts[i] != "unknown":
                    widths.append(int(sniff_w[i]))
                    heights.append(int(sniff_h[i]))
                else:
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                hashes.append(ahash64(payload or b""))
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append([0.0, 0.0, 0.0, 0.0])
                heights.append(0)
                widths.append(0)
                hashes.append(0)
                ok.append(False)
        out = t.drop_columns(["payload"])   # blobs do not travel past decode
        out = out.append_column("features",
                                pa.array(feats, type=pa.list_(pa.float64())))
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("payload_ahash",
                                pa.array(hashes, type=pa.uint64()))
        return out.append_column("decode_ok", pa.array(ok, type=pa.bool_()))


def decode_features(media_ds, concurrency: int = 4, batch_size: int = 256):
    """Small batch_size: rows are payload-wide (SURVEY §7.5.5)."""
    return media_ds.map_batches(
        FakeDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=0.5)


class FakeResizer(FakeDecoder):
    """Resize stage: stubbed byte->pixel decode, REAL resize arithmetic
    (block-mean downsample, the arithmetic a PIL/cv2 swap-in would keep).
    Emits the resized luminance row-major as ``list<float>`` plus dims."""

    def __init__(self, src_size: int = 32, dst_size: int = 8,
                 strict: bool = False, use_pil: bool | None = None):
        super().__init__(target_size=src_size, strict=strict,
                         use_pil=use_pil)
        if src_size % dst_size:
            raise ValueError("dst_size must divide src_size")
        self.dst = dst_size

    def _to_grid(self, img: np.ndarray) -> np.ndarray:
        """PIL-decoded images come in arbitrary dims; regrid to the
        target² working size by deterministic nearest-index sampling so the
        block-mean arithmetic below applies uniformly. The fake decode is
        already target² (no-op — the oracle arithmetic is unchanged)."""
        if img.shape == (self.target, self.target):
            return img
        yi = (np.arange(self.target) * img.shape[0]) // self.target
        xi = (np.arange(self.target) * img.shape[1]) // self.target
        return img[np.ix_(yi, xi)]

    def __call__(self, t: pa.Table) -> pa.Table:
        s = self.target // self.dst
        resized, ok = [], []
        for payload in t.column("payload").to_pylist():
            try:
                img = self._to_grid(self._decode(payload)).astype(np.float64)
                small = img.reshape(self.dst, s, self.dst, s).mean((1, 3))
                resized.append([float(x) for x in small.ravel()])
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                resized.append([0.0] * (self.dst * self.dst))
                ok.append(False)
        out = t.drop_columns(["payload"])
        out = out.append_column(
            "resized", pa.array(resized, type=pa.list_(pa.float64())))
        out = out.append_column(
            "resized_dim", pa.array([self.dst] * t.num_rows,
                                    type=pa.int32()))
        return out.append_column("decode_ok", pa.array(ok, type=pa.bool_()))


def resize_media(media_ds, dst_size: int = 8, concurrency: int = 4,
                 batch_size: int = 256):
    """Actor-pool resize stage (blobs dropped on the way out)."""
    return media_ds.map_batches(
        FakeResizer, fn_constructor_kwargs={"dst_size": dst_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=0.5)


class FakeFeatureResizer(FakeResizer):
    """Fused decode-features + block-mean resize stage: ONE decode per
    payload serves both signal sets — the fusion shape a 100 TB media sweep
    wants (never re-decode a wide binary column per signal). Output is the
    union of the :class:`FakeDecoder` feature columns and the
    :class:`FakeResizer` resize columns."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from pixcrawler_ray.functions.mediameta import sniff_dims

        payloads = t.column("payload").to_pylist()
        fmts, sniff_w, sniff_h = sniff_dims(payloads)
        s = self.target // self.dst
        feats, widths, heights, hashes, ok, resized = [], [], [], [], [], []
        for i, payload in enumerate(payloads):
            try:
                img = self._decode(payload)
                feats.append([float(img.mean()), float(img.std()),
                              float(img.min()), float(img.max())])
                if fmts[i] != "unknown":
                    widths.append(int(sniff_w[i]))
                    heights.append(int(sniff_h[i]))
                else:
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                hashes.append(ahash64(payload or b""))
                small = self._to_grid(img).astype(np.float64).reshape(
                    self.dst, s, self.dst, s).mean((1, 3))
                resized.append([float(x) for x in small.ravel()])
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append([0.0, 0.0, 0.0, 0.0])
                heights.append(0)
                widths.append(0)
                hashes.append(0)
                resized.append([0.0] * (self.dst * self.dst))
                ok.append(False)
        out = t.drop_columns(["payload"])
        out = out.append_column("features",
                                pa.array(feats, type=pa.list_(pa.float64())))
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("payload_ahash",
                                pa.array(hashes, type=pa.uint64()))
        out = out.append_column(
            "resized", pa.array(resized, type=pa.list_(pa.float64())))
        out = out.append_column(
            "resized_dim", pa.array([self.dst] * t.num_rows,
                                    type=pa.int32()))
        return out.append_column("decode_ok", pa.array(ok, type=pa.bool_()))


def decode_features_resized(media_ds, dst_size: int = 8,
                            concurrency: int = 4, batch_size: int = 256):
    """Fused features+resize actor-pool stage (blobs dropped on the way out)."""
    return media_ds.map_batches(
        FakeFeatureResizer, fn_constructor_kwargs={"dst_size": dst_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=0.5)


def sample_frames(media_ds, frame_bytes: int = 1024, stride: int = 4,
                  max_frames: int = 8, concurrency: int = 4):
    """``video`` rows -> frame rows (media_id, frame_idx, frame_payload).

    Deterministic chunk sampling stands in for ffmpeg keyframe extraction:
    the payload is treated as a stream of ``frame_bytes`` chunks and every
    ``stride``-th chunk (up to ``max_frames``) becomes one output row — the
    flat-map row-explosion shape a real video pipeline needs (one media row
    fans out to many frame rows; frame payloads stay binary and bounded).
    """

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        mask = pa.compute.equal(t.column("media_type"), "video")
        t = t.filter(mask)
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            payload = payload or b""
            n_chunks = max(1, (len(payload) + frame_bytes - 1)
                           // frame_bytes)
            for fi, chunk in enumerate(range(0, n_chunks, stride)):
                if fi >= max_frames:
                    break
                ids.append(mid)
                idxs.append(fi)
                frames.append(
                    payload[chunk * frame_bytes:(chunk + 1) * frame_bytes])
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int32()),
            "frame_payload": pa.array(frames, type=pa.binary()),
        })

    return media_ds.map_batches(explode, batch_format="pyarrow",
                                batch_size=256)


# ------------------------------------------------------ charset sniffing --

def charset_sniff(sf_dir: str):
    """Charset detection + byte round-trip over a synthesized encoded-bytes
    column — the Common Crawl reality that page bytes arrive in mixed
    encodings and must be sniffed before any text stage (the WARC
    `WARC-Identified-Content-Charset` problem). The payload synthesis rule
    is closed-form (so the SQL oracle can state the expected outcome), but
    the Ray side must EARN it by actually decoding bytes:

      doc_id % 3 == 0  ->  utf-8 bytes of text            (all-ASCII corpus
                            => detector must report 'ascii')
      doc_id % 3 == 1  ->  utf-16-le with BOM             (-> 'utf-16')
      doc_id % 3 == 2  ->  latin-1 bytes of text + 0xE9   (0xE9 is invalid
                            standalone utf-8 => detector must FALL BACK to
                            'latin-1' after a real utf-8 decode failure)

    Detector (per payload, documented-scalar like the zlib recompress
    kernel — decode validity is a byte-level library call, not an Arrow
    kernel): BOM => utf-16; else all bytes < 0x80 => ascii; else try
    utf-8, on UnicodeDecodeError fall back latin-1. Output
    (doc_id, charset, n_chars, roundtrip_ok) where n_chars counts decoded
    characters and roundtrip_ok asserts decode(encode(text)) == expected
    text — a decoder defect diverges from the oracle. (Inherent sniffing
    ambiguity, documented: latin-1 byte runs that happen to form valid
    utf-8 sequences are indistinguishable from utf-8 — real detectors
    carry the same blind spot; the trailing 0xE9 construction keeps the
    synthesized class unambiguous on latin-1-only text.)
    """
    from pixcrawler_ray.sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def kernel(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        charsets, n_chars, ok = [], [], []
        for d, txt in zip(ids, texts):
            txt = txt or ""
            m = int(d) % 3
            if m == 0:
                payload = txt.encode("utf-8")
                expect = txt
            elif m == 1:
                payload = b"\xff\xfe" + txt.encode("utf-16-le")
                expect = txt
            else:
                # latin-1 can't carry chars above U+00FF: fold them out of
                # the SYNTHESIS (never crash); the all-ASCII corpus is
                # unaffected, so the closed-form oracle still holds there
                safe = txt.encode("latin-1", "ignore").decode("latin-1")
                expect = safe + "\xe9"
                payload = expect.encode("latin-1")
            # ---- detection over the BYTES only ----
            if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
                cs, dec = "utf-16", payload.decode("utf-16")
            elif not payload or max(payload) < 0x80:
                cs, dec = "ascii", payload.decode("ascii")
            else:
                try:
                    cs, dec = "utf-8", payload.decode("utf-8")
                except UnicodeDecodeError:
                    cs, dec = "latin-1", payload.decode("latin-1")
            charsets.append(cs)
            n_chars.append(len(dec))
            ok.append(dec == expect)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "charset": pa.array(charsets, type=pa.string()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "roundtrip_ok": pa.array(ok, type=pa.bool_())})

    return ds.map_batches(kernel, batch_format="pyarrow")
