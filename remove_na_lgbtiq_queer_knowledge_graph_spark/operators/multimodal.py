"""Multimodal column plumbing (BASELINE.json scale extensions).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested.

Codec status, honestly: jpeg/mp3/mp4 are STUBBED (their codec libs
aren't in this container — PIL/librosa absence re-confirmed round 7)
behind ``decode_stub``, a deterministic fake that derives pseudo
metadata from the byte content so plumbing and oracles stay checkable;
swapping in PIL/librosa/ffmpeg changes only the body of the pandas
function, not the plan.  Three formats are REAL: ``decode_wav_real``
parses actual RIFF/WAVE PCM with the stdlib ``wave`` module,
``decode_ppm_real`` parses actual binary netpbm (P6/P5), and — round
7 — ``decode_png_real`` parses actual PNG (chunk walk + CRCs + zlib
inflate + all five scanline filters; DEFLATE is stdlib ``zlib``, so
png never needed PIL).  All three are exercised end-to-end by
encode→decode round-trip registry queries with analytic oracles
(``mm_wav_real_decode`` / ``mm_ppm_real_decode`` /
``mm_png_real_decode``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, fmt string"
)



# Scalar half-away-from-zero rounding to 6 dp — the SQL ``round``
# semantics every oracle-compared value must use (Python's ``round``
# is half-EVEN; the round-9 fuzz class in functions/numeric.py).
# Delegates to the ONE scalar kernel instead of wrapping the numpy
# path per row (round-13 review: this was a third copy, and the
# function-level import ran once per decoded row).
from ..functions.numeric import round_half_away as _scalar_rha


def _rha6(x):
    return _scalar_rha(float(x), 6)

def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a binary media column: (id, payload binary).  In production
    this is the raw image/audio bytes column of the lakehouse table."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder over Arrow batches.

    Real decoders (PIL.Image.open etc.) are unavailable here —
    the pseudo width/height/format derive from byte length so results
    are reproducible and SQL-checkable.  Raises on null payloads like a
    real decoder would on corrupt bytes.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": n_bytes % 640,
                "height": (n_bytes * 7) % 480,
                "fmt": (n_bytes % 2).map({0: "png", 1: "jpeg"}),
            }
        )


def decode_metadata(payloads: DataFrame, decode_fn=decode_stub,
                    schema: str = DECODED_SCHEMA) -> DataFrame:
    """mapInPandas decode: binary payload → typed metadata rows.
    Arrow-batched, partition-parallel — the shape of every multimodal
    feature-extraction stage (resize, frame-sample, spectrogram).

    ``decode_fn`` is the injection seam: a real deployment passes a
    batches→batches function that opens the payload with PIL/ffmpeg —
    nothing else in the plan changes (dependency-injection tested in
    tests/test_llm_ops.py)."""
    return payloads.mapInPandas(decode_fn, schema=schema)


def not_implemented_real_decode() -> None:
    """Marker for the real codec path (compressed formats only)."""
    raise NotImplementedError(
        "jpeg/mp3 decode requires PIL/librosa; container ships neither — "
        "see decode_wav_real / decode_ppm_real / decode_png_real for the "
        "formats that need only stdlib+numpy"
    )


# ---------------------------------------------------------------------------
# REAL codecs — self-describing formats decodable with stdlib + numpy.
#
# The compressed formats (jpeg/png/mp3) stay stubbed because their codec
# libraries aren't in this container, but RIFF/WAVE PCM and binary
# netpbm (P6/P5) need nothing beyond the standard library: these paths
# parse the actual byte format, so the multimodal story is
# capability-complete for one audio and one image codec, not just
# plumbing-complete.  The registry queries build real payloads from
# deterministic parameters and decode them back — the oracle checks the
# decoded metadata against the analytically-known values, an
# encode→decode round-trip proof that runs on both engines.
# ---------------------------------------------------------------------------

WAV_META_SCHEMA = (
    "doc_id bigint, sample_rate bigint, n_channels bigint, "
    "n_samples bigint, duration_ms double, rms double"
)

PPM_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, maxval bigint, mean_px double"
)


def encode_wav_square(doc_id: int, n_samples: int, amplitude: int,
                      sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE mono PCM16 bytes of a ±amplitude square wave — a real
    WAV file any player opens.  With an even sample count the RMS is
    exactly ``amplitude`` (integers ≤ 2^15, squares exact in double),
    which is what makes the decode oracle analytic."""
    import io
    import wave

    import numpy as np

    pcm = np.empty(n_samples, dtype=np.int16)
    pcm[0::2] = amplitude
    pcm[1::2] = -amplitude
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_payload_builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id) → (doc_id, payload): real WAV bytes with parameters
    derived from the id — n_samples = 800 + (id%10)·160 (always even),
    amplitude = 1000 + (id%5)·500."""
    for pdf in batches:
        ids = pdf["doc_id"]
        yield pd.DataFrame({
            "doc_id": ids,
            "payload": [
                encode_wav_square(
                    int(d), 800 + (int(d) % 10) * 160, 1000 + (int(d) % 5) * 500
                )
                for d in ids
            ],
        })


def decode_wav_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL WAV decode: stdlib ``wave`` header parse + numpy PCM read.
    Raises ``wave.Error`` on corrupt bytes, like any decoder."""
    import io
    import wave

    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "sample_rate": [], "n_channels": [],
            "n_samples": [], "duration_ms": [], "rms": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                sr = w.getframerate()
                ch = w.getnchannels()
                n = w.getnframes()
                sw = w.getsampwidth()
                # fail loud, not silently-wrong: frombuffer(int16) on
                # 8/24/32-bit PCM decodes garbage with no error, and a
                # zero framerate divides below (round-13 review)
                if sw != 2:
                    raise ValueError(
                        f"decode_wav_real: only 16-bit PCM supported, "
                        f"got sample width {sw} bytes")
                if sr <= 0:
                    raise ValueError(
                        f"decode_wav_real: invalid frame rate {sr}")
                frames = w.readframes(n)
                if len(frames) % 2:
                    raise ValueError(
                        "decode_wav_real: truncated PCM frame data")
                data = np.frombuffer(frames, dtype=np.int16) \
                    .astype(np.float64)
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(sr)
            out["n_channels"].append(ch)
            out["n_samples"].append(n)
            out["duration_ms"].append(_rha6(n * 1000.0 / sr))
            out["rms"].append(_rha6(np.sqrt(np.mean(data * data))))
        yield pd.DataFrame(out)


def encode_ppm_gradient(doc_id: int, width: int, height: int) -> bytes:
    """Binary netpbm P6 (24-bit RGB) bytes of the gradient image
    ``px[i,j,c] = (i + j + doc_id) mod 256`` — a real PPM any image
    tool opens."""
    import numpy as np

    header = f"P6\n{width} {height}\n255\n".encode()
    grad = (
        (np.arange(height)[:, None] + np.arange(width)[None, :] + doc_id) % 256
    ).astype(np.uint8)
    px = np.repeat(grad[:, :, None], 3, axis=2)
    return header + px.tobytes()


def ppm_payload_builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id) → (doc_id, payload): real P6 bytes, width = 16+id%16,
    height = 12+id%8."""
    for pdf in batches:
        ids = pdf["doc_id"]
        yield pd.DataFrame({
            "doc_id": ids,
            "payload": [
                encode_ppm_gradient(int(d), 16 + int(d) % 16, 12 + int(d) % 8)
                for d in ids
            ],
        })


def _parse_netpbm_header(raw: bytes) -> tuple[bytes, int, int, int, int]:
    """Binary-netpbm (P5/P6) header parse shared by the decode and
    dHash paths: returns ``(magic, width, height, maxval, raster_pos)``.

    Raises ``ValueError`` — never ``IndexError`` — on a truncated or
    malformed header: every byte scan is bounded by ``len(raw)``
    (round-11 advice: the unbounded ``while raw[pos] ...`` walked off
    the end of a header-only payload before any length check could
    fire).  ``#`` comment lines, legal anywhere whitespace may appear
    in a netpbm header, are skipped to end-of-line; a ``#`` glued
    directly onto a digit token (no separating whitespace) is rejected
    as a malformed token rather than guessed at."""
    magic = raw[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    n = len(raw)
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < n and raw[pos] in b" \t\r\n#":
            if raw[pos] == 0x23:          # '#' comment runs to newline
                while pos < n and raw[pos] not in b"\r\n":
                    pos += 1
            else:
                pos += 1
        start = pos
        while pos < n and raw[pos] not in b" \t\r\n":
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        try:
            tokens.append(int(raw[start:pos]))
        except ValueError:
            raise ValueError(
                f"malformed netpbm header token {raw[start:pos]!r}") from None
    if pos >= n:
        raise ValueError("truncated netpbm header")
    pos += 1  # single whitespace byte after maxval, then the raster
    width, height, maxval = tokens
    # spec-legal maxval > 255 means 2-BYTE samples: frombuffer(uint8)
    # would silently read the MSB/LSB-interleaved first half as pixels
    # (round-13 review repro: mean_px 0.0, no error); zero dims divide
    # downstream — both are loud ValueErrors, the decoder's contract
    if width <= 0 or height <= 0:
        raise ValueError(
            f"invalid netpbm dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(
            f"unsupported netpbm maxval {maxval} (only 1-byte samples)")
    return magic, width, height, maxval, pos


def decode_ppm_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL binary-netpbm decode (P6 RGB / P5 gray): header token parse
    (``_parse_netpbm_header`` — bounded, comment-aware, fail-loud) +
    numpy pixel read.  ``mean_px`` divides the exact integer pixel sum
    by the exact pixel count, so the value is engine-reproducible.
    Raises ``ValueError`` on a malformed header or truncated raster."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [], "maxval": [], "mean_px": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            magic, width, height, maxval, pos = _parse_netpbm_header(raw)
            channels = 3 if magic == b"P6" else 1
            n_px = width * height * channels
            if len(raw) - pos < n_px:
                raise ValueError("truncated netpbm raster")
            px = np.frombuffer(raw, dtype=np.uint8, count=n_px, offset=pos)
            out["doc_id"].append(doc_id)
            out["width"].append(width)
            out["height"].append(height)
            out["maxval"].append(maxval)
            out["mean_px"].append(_rha6(float(int(px.sum(dtype=np.int64))) / n_px))
        yield pd.DataFrame(out)


def ppm_near_dup_payload_builder(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(doc_id) → (doc_id, payload): real P6 bytes built as NEAR-DUP
    TWINS — docs pair up on ``base = doc_id - doc_id % 2`` (same dims
    ``w = 16 + base % 16``, ``h = 12 + base % 8``, same gradient
    ``px[i,j] = (i + j + base) % 215``), and the ODD twin additionally
    brightens the left half of the top and bottom pixel rows by +40.

    The bump is the planted perturbation for Hamming-tolerant image
    dedup: it shifts block-mean comparisons only in dHash grid rows 0
    and 7, so twin hashes differ by 1–4 bits (measured over 500 twin
    pairs; 98% of them flip bits in ≥2 different 8-bit bands — the
    band-boundary-crossing case the pigeonhole join must still catch).
    Every pixel stays ≤ 214 + 40 = 254 < 256 (the gradient's max value
    is 214 since px is taken mod 215).  Mirrored analytically by the
    ``mm_phash_cluster_keep`` oracle."""
    import numpy as np

    for pdf in batches:
        payloads = []
        for d in pdf["doc_id"]:
            d = int(d)
            base = d - d % 2
            w, h = 16 + base % 16, 12 + base % 8
            i = np.arange(h)[:, None]
            j = np.arange(w)[None, :]
            v = (i + j + base) % 215
            if d % 2 == 1:
                v = v + 40 * ((2 * j < w) & ((i == 0) | (i == h - 1)))
            px = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
            header = f"P6\n{w} {h}\n255\n".encode()
            payloads.append(header + px.tobytes())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


DHASH_SCHEMA = "doc_id bigint, dhash string"


def dhash_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Perceptual difference-hash (dHash) over REAL decoded netpbm
    rasters — the image near-dup fingerprint (Krawetz's aHash/dHash
    family): pool the luminance plane to an 8×9 block-mean grid, emit
    one bit per horizontally adjacent cell pair ('is the right block
    brighter'), 64 bits row-major.

    Every arithmetic step stays in INTEGERS: block sums are exact
    int64, and the brightness comparison cross-multiplies
    ``s_right·n_left > s_left·n_right`` instead of comparing float
    means — no rounding enters the hash, so the DuckDB oracle can
    reproduce it bit-for-bit from the analytic gradient.  Block
    assignment is the pixel→cell map ``r = i·8 // h``, ``c = j·9 // w``
    (integer division, mirrored verbatim in SQL).  Requires w ≥ 9 and
    h ≥ 8 — CHECKED explicitly per image (an undersized raster leaves
    empty grid cells whose comparisons would silently fabricate zero
    bits; the integer cross-multiplication never divides, so nothing
    fails on its own)."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "dhash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            magic, width, height, _maxval, pos = _parse_netpbm_header(raw)
            channels = 3 if magic == b"P6" else 1
            n_px = width * height * channels
            if len(raw) - pos < n_px:
                raise ValueError("truncated netpbm raster")
            if width < 9 or height < 8:
                raise ValueError(
                    f"dhash_ppm: image {width}x{height} smaller than the "
                    f"9x8 pooling grid — empty cells would fabricate bits")
            px = np.frombuffer(raw, dtype=np.uint8, count=n_px, offset=pos)
            lum = px.reshape(height, width, channels).sum(
                axis=2, dtype=np.int64)
            R, C = 8, 9
            r_idx = (np.arange(height) * R) // height
            c_idx = (np.arange(width) * C) // width
            s = np.zeros((R, C), dtype=np.int64)
            np.add.at(s, (r_idx[:, None], c_idx[None, :]), lum)
            cnt_r = np.bincount(r_idx, minlength=R).astype(np.int64)
            cnt_c = np.bincount(c_idx, minlength=C).astype(np.int64)
            n = cnt_r[:, None] * cnt_c[None, :]
            bits = s[:, 1:] * n[:, :-1] > s[:, :-1] * n[:, 1:]
            out["doc_id"].append(doc_id)
            out["dhash"].append(
                "".join("1" if b else "0" for b in bits.ravel()))
        yield pd.DataFrame(out)


PNG_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, bit_depth bigint, "
    "color_type bigint, mean_px double"
)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_gradient(doc_id: int, width: int, height: int) -> bytes:
    """REAL PNG bytes (round 7): 8-bit grayscale gradient
    ``px[i,j] = (i + j + doc_id) % 256`` — spec-conformant signature,
    IHDR/IDAT/IEND chunks with CRCs, zlib-compressed filtered
    scanlines.  PNG needs nothing beyond stdlib ``zlib``, so unlike
    jpeg/mp3 it moves off the stub list.  Scanline filters CYCLE
    ``row % 5`` through None/Sub/Up/Average/Paeth so a decoder must
    implement all five to reconstruct the gradient."""
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw_rows = [
        bytes((i + j + doc_id) % 256 for j in range(width))
        for i in range(height)
    ]
    stream = bytearray()
    for i, row in enumerate(raw_rows):
        ft = i % 5
        prior = raw_rows[i - 1] if i else bytes(width)
        stream.append(ft)
        for j in range(width):
            left = row[j - 1] if j else 0
            up = prior[j]
            upleft = prior[j - 1] if j else 0
            if ft == 0:
                f = row[j]
            elif ft == 1:
                f = row[j] - left
            elif ft == 2:
                f = row[j] - up
            elif ft == 3:
                f = row[j] - (left + up) // 2
            else:
                f = row[j] - _paeth(left, up, upleft)
            stream.append(f & 0xFF)
    return (sig + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _png_chunk(b"IEND", b""))


def png_payload_builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id) → (doc_id, payload): real PNG bytes, width = 16+id%16,
    height = 12+id%8 (the PPM grid)."""
    for pdf in batches:
        ids = pdf["doc_id"]
        yield pd.DataFrame({
            "doc_id": ids,
            "payload": [
                encode_png_gradient(int(d), 16 + int(d) % 16, 12 + int(d) % 8)
                for d in ids
            ],
        })


def decode_png_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL PNG decode, pure stdlib-``zlib`` + python: signature check,
    chunk walk with CRC verification, IHDR parse, IDAT concat +
    decompress, per-scanline UNFILTER of all five PNG filter types
    (None/Sub/Up/Average/Paeth), exact integer pixel sum.  Supports
    8-bit greyscale (color type 0) and RGB (2), non-interlaced — the
    subset the lake's synthetic payloads and most ML thumbnails need;
    anything else raises like a real decoder on an unsupported
    variant.  Raises ``ValueError`` on bad signature, CRC mismatch, or
    truncated raster."""
    import struct
    import zlib

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [], "bit_depth": [],
            "color_type": [], "mean_px": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            if raw[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG signature")
            pos, ihdr, idat = 8, None, bytearray()
            while pos < len(raw):
                if pos + 8 > len(raw):
                    raise ValueError("truncated chunk header")
                (length,) = struct.unpack(">I", raw[pos:pos + 4])
                tag = raw[pos + 4:pos + 8]
                if pos + 12 + length > len(raw):
                    # a payload cut mid-chunk must surface as the
                    # documented ValueError, not struct.error from an
                    # undersized unpack slice (round-7 ADVICE)
                    raise ValueError(f"truncated chunk {tag!r}")
                data = raw[pos + 8:pos + 8 + length]
                (crc,) = struct.unpack(
                    ">I", raw[pos + 8 + length:pos + 12 + length])
                if crc != zlib.crc32(tag + data):
                    raise ValueError(f"CRC mismatch in {tag!r}")
                if tag == b"IHDR":
                    if length != 13:
                        # wrong-length IHDR with a VALID crc escaped as
                        # struct.error (round-13 review)
                        raise ValueError(
                            f"bad IHDR length {length} (want 13)")
                    ihdr = struct.unpack(">IIBBBBB", data)
                elif tag == b"IDAT":
                    idat.extend(data)
                elif tag == b"IEND":
                    break
                pos += 12 + length
            if ihdr is None:
                raise ValueError("missing IHDR")
            width, height, depth, ctype, _, _, interlace = ihdr
            if depth != 8 or ctype not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG variant: depth={depth} "
                    f"color_type={ctype} interlace={interlace}")
            if width <= 0 or height <= 0:
                raise ValueError(
                    f"invalid PNG dimensions {width}x{height}")
            if not idat:
                raise ValueError("missing IDAT")
            bpp = 1 if ctype == 0 else 3
            stride = width * bpp
            expected = (stride + 1) * height
            try:
                # bufsize+1 cap: a zip-bomb IDAT declaring huge dims
                # must not allocate unbounded memory before the length
                # check; one extra byte distinguishes over-long streams
                stream = zlib.decompress(bytes(idat), bufsize=expected + 1)
            except zlib.error as exc:
                raise ValueError(f"bad PNG IDAT stream: {exc}") from None
            if len(stream) != expected:
                raise ValueError("truncated PNG raster")
            prior = bytearray(stride)
            total = 0
            for i in range(height):
                ft = stream[i * (stride + 1)]
                line = bytearray(
                    stream[i * (stride + 1) + 1:(i + 1) * (stride + 1)])
                if ft > 4:
                    raise ValueError(f"bad filter type {ft}")
                for x in range(stride):
                    left = line[x - bpp] if x >= bpp else 0
                    up = prior[x]
                    upleft = prior[x - bpp] if x >= bpp else 0
                    if ft == 1:
                        line[x] = (line[x] + left) & 0xFF
                    elif ft == 2:
                        line[x] = (line[x] + up) & 0xFF
                    elif ft == 3:
                        line[x] = (line[x] + (left + up) // 2) & 0xFF
                    elif ft == 4:
                        line[x] = (line[x] + _paeth(left, up, upleft)) & 0xFF
                total += sum(line)
                prior = line
            out["doc_id"].append(doc_id)
            out["width"].append(width)
            out["height"].append(height)
            out["bit_depth"].append(depth)
            out["color_type"].append(ctype)
            out["mean_px"].append(_rha6(total / (width * height * bpp)))
        yield pd.DataFrame(out)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, t_ms bigint, frame_sig string"

RESIZED_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, scale double, resized_sig string"
)


def frame_sample_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame sampling: one input row → N frame rows (the 1→N Arrow
    batch shape every frame/segment extractor has).  Frame count and
    timestamps derive deterministically from the payload (stub for an
    ffmpeg keyframe walk); frame content is fingerprinted, not stored —
    at 100 TB you write frame refs + sigs, not frame bytes, back to the
    lake."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "t_ms": [], "frame_sig": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload) % 8 + 1
            for i in range(n):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["t_ms"].append(i * 1000)
                out["frame_sig"].append(
                    hashlib.md5(bytes(payload) + f":{i}".encode()).hexdigest()
                )
        yield pd.DataFrame(out)


def frame_sample(payloads: DataFrame, sample_fn=frame_sample_stub,
                 schema: str = FRAME_SCHEMA) -> DataFrame:
    """mapInPandas frame sampler (1 video row → N frame rows).
    ``sample_fn`` is the real-codec injection seam."""
    return payloads.mapInPandas(sample_fn, schema=schema)


def resize_stub(
    target_w: int, target_h: int,
):
    """Image resize plan: metadata math is real (fit-scale), pixel work is
    the stubbed codec.  Emits a content signature of the would-be resized
    payload so downstream exact-dedup over resized media stays testable."""
    import hashlib

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            width = n_bytes % 640
            height = (n_bytes * 7) % 480
            scale = (
                pd.concat(
                    [target_w / width.clip(lower=1), target_h / height.clip(lower=1)],
                    axis=1,
                )
                .min(axis=1)
            )
            from .ann import _round_half_away

            scale = pd.Series(_round_half_away(scale.to_numpy(), 6),
                              index=scale.index)
            sig = [
                hashlib.md5(bytes(p) + f"@{target_w}x{target_h}".encode()).hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "scale": scale,
                    "resized_sig": sig,
                }
            )

    return _run


def resize_plan(payloads: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """mapInPandas resize stage (binary in → typed metadata + signature)."""
    return payloads.mapInPandas(resize_stub(target_w, target_h), schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = "doc_id bigint, window_idx bigint, n_samples bigint, rms double"


def audio_energy_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Windowed audio energy over the fake-PCM decode: every payload
    byte is one unsigned 8-bit sample (the deterministic stand-in for a
    librosa/ffmpeg decode — container ships neither), centered at 128;
    per fixed 16-sample window emit the RMS.  1 payload row → N window
    rows, vectorized numpy per Arrow batch — the exact shape of a real
    segment-energy / VAD pre-filter stage over an audio lake column."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "window_idx": [],
                                "n_samples": [], "rms": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(bytes(payload), dtype=np.uint8) \
                  .astype(np.float64) - 128.0
            for w in range((len(a) + 15) // 16):
                seg = a[w * 16:(w + 1) * 16]
                out["doc_id"].append(doc_id)
                out["window_idx"].append(w)
                out["n_samples"].append(len(seg))
                out["rms"].append(_rha6(np.sqrt(np.mean(seg * seg))))
        yield pd.DataFrame(out)


def audio_energy(payloads: DataFrame, energy_fn=audio_energy_stub,
                 schema: str = AUDIO_SCHEMA) -> DataFrame:
    """mapInPandas windowed-energy extractor; ``energy_fn`` is the
    real-codec injection seam (same contract as decode_metadata)."""
    return payloads.mapInPandas(energy_fn, schema=schema)
