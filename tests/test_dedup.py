"""Near-dup detector quality gates: recall/precision on a corpus with
planted near-duplicates, plus multimodal plumbing and text stats."""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_sf_dir(tmp_path_factory):
    """A fake sf dir whose documents table contains planted near-dup
    clusters: doc i and doc i+1000 share ~90% of tokens."""
    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(2000)]
    ids, texts, langs, srcs = [], [], [], []
    originals = {}
    for i in range(120):
        words = [rng.choice(vocab) for _ in range(80)]
        originals[i] = words
        ids.append(i)
        texts.append(" ".join(words))
        langs.append("en")
        srcs.append("src0")
    # planted near-dups: copy with ~8% token edits
    for i in range(0, 120, 3):
        words = list(originals[i])
        for _ in range(6):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        ids.append(1000 + i)
        texts.append(" ".join(words))
        langs.append("en")
        srcs.append("src1")
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def brute_jaccard_pairs(sf_dir, threshold_bp):
    from search_engine_ray.functions.dedup import _shingle_hashes

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    docs = {int(d): np.unique(_shingle_hashes(x))
            for d, x in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    ids = sorted(docs)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = docs[ids[i]], docs[ids[j]]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            if inter * 10000 // max(union, 1) >= threshold_bp:
                out.add((ids[i], ids[j]))
    return out


def test_minhash_recall_and_precision(ray_session, planted_sf_dir):
    from search_engine_ray.functions.dedup import minhash_dedup

    got = minhash_dedup(planted_sf_dir, threshold_bp=7000)
    got_pairs = set(zip(got.column("doc_a").to_pylist(),
                        got.column("doc_b").to_pylist()))
    truth = brute_jaccard_pairs(planted_sf_dir, 7000)
    assert truth, "fixture must contain true near-dups"
    # verification makes precision exact; LSH recall must be high
    assert got_pairs <= truth or not (got_pairs - truth)
    recall = len(got_pairs & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth))


def test_minhash_no_false_positives_below_threshold(ray_session,
                                                    planted_sf_dir):
    from search_engine_ray.functions.dedup import minhash_dedup

    got = minhash_dedup(planted_sf_dir, threshold_bp=7000)
    for bp in got.column("jaccard_bp").to_pylist():
        assert bp >= 7000


def test_simhash_finds_planted_dups(ray_session, planted_sf_dir):
    from search_engine_ray.functions.dedup import simhash_dedup

    got = simhash_dedup(planted_sf_dir, max_hamming=10)
    pairs = set(zip(got.column("doc_a").to_pylist(),
                    got.column("doc_b").to_pylist()))
    planted = {(i, 1000 + i) for i in range(0, 120, 3)}
    found = len(pairs & planted)
    assert found >= len(planted) * 0.5, (found, len(planted))
    for h in got.column("hamming").to_pylist():
        assert h <= 10


def test_embedding_neardup(ray_session, sf_dir):
    from search_engine_ray.functions.dedup import embedding_neardup

    got = embedding_neardup(sf_dir, threshold_bp=9000)
    # symmetric, deduped, ordered pairs
    seen = set()
    for a, b, bp in zip(got.column("vec_a").to_pylist(),
                        got.column("vec_b").to_pylist(),
                        got.column("cos_bp").to_pylist()):
        assert a < b
        assert bp >= 9000
        assert (a, b) not in seen
        seen.add((a, b))


def test_candidate_pairs_hot_bucket_cap():
    import pandas as pd

    from search_engine_ray.functions.dedup import _candidate_pairs

    small = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)})
    got = _candidate_pairs(small)
    assert len(got) == 45  # all pairs below the cap
    hot = pd.DataFrame({"doc_id": np.arange(600, dtype=np.int64)})
    got = _candidate_pairs(hot)
    # star on the smallest id: O(B) not O(B²)
    assert len(got) == 599
    assert (got["doc_a"] == 0).all()


def test_minhash_degenerate_bucket(ray_session, tmp_path):
    """A boilerplate cluster (3k identical docs) must not explode a
    single LSH group task quadratically: the hot-bucket star cap emits
    O(B) candidate pairs, all of which verify at jaccard 10000."""
    from search_engine_ray.functions.dedup import minhash_dedup

    m = 3000
    text = " ".join(f"tok{i % 37}" for i in range(60))
    t = pa.table({
        "doc_id": pa.array(list(range(m)), pa.int64()),
        "text": pa.array([text] * m, pa.string()),
    })
    d = tmp_path / "degenerate"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = minhash_dedup(str(d), threshold_bp=7000)
    # every band bucket holds all m docs → every band emits the same
    # star → distinct pairs = m-1, connecting the whole component
    assert got.num_rows == m - 1
    assert set(got.column("doc_a").to_pylist()) == {0}
    assert set(got.column("jaccard_bp").to_pylist()) == {10000}


def test_lang_id_on_real_languages(ray_session, tmp_path):
    from search_engine_ray.functions.textstats import detect_lang

    assert detect_lang("the cat and the dog are in the house") == "en"
    assert detect_lang("der Hund und die Katze sind nicht da") == "de"
    assert detect_lang("le chat est dans la maison et il dort") == "fr"
    assert detect_lang("el perro es grande y la casa es una") == "es"
    assert detect_lang("这是一个中文文档 关于搜索引擎") == "zh"
    assert detect_lang("") == "und"


def test_quality_and_fingerprints(ray_session, sf_dir):
    from search_engine_ray.functions.textstats import (fingerprints,
                                                       quality_score)

    q = quality_score(sf_dir).to_pandas()
    assert (q["quality_bp"] >= 0).all() and (q["quality_bp"] <= 10000).all()
    f = fingerprints(sf_dir).to_pandas()
    assert (f["n_fingerprints"] > 0).all()
    # determinism
    f2 = fingerprints(sf_dir).to_pandas()
    assert f.sort_values("doc_id").reset_index(drop=True).equals(
        f2.sort_values("doc_id").reset_index(drop=True))


def test_multimodal_plumbing(ray_session):
    from search_engine_ray.functions.multimodal import (ImageDecodeResize,
                                                        media_pipeline,
                                                        synth_media_table)

    images, audio, video = media_pipeline(48)
    img = images.to_pandas()
    assert len(img) == 16  # one third of 48
    assert (img["feat_dim"] == 32 * 32 * 3).all()
    au = audio.to_pandas()
    assert au.groupby("media_id").size().min() >= 1
    # strict mode decodes real BMP payloads fine but surfaces the
    # JPEG/PNG stub explicitly for non-BMP payloads
    strict = ImageDecodeResize(strict=True)
    assert strict(synth_media_table(3)).num_rows == 1
    garbage = synth_media_table(3).set_column(
        2, "payload", pa.array([b"\x89PNG not really"] * 3, pa.binary()))
    with pytest.raises(NotImplementedError):
        strict(garbage)


def test_image_decode_is_real_bmp(ray_session):
    """Image payloads are genuine 24-bit BMPs and the stage's features
    come from the actual pixels (encode → decode roundtrip exact)."""
    from search_engine_ray.functions.multimodal import (
        ImageDecodeResize, bmp_decode, bmp_encode, synth_media_table)

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(arr)), arr)

    t = synth_media_table(9)
    img_rows = t.filter(pa.compute.equal(t.column("kind"), "image"))
    payload = img_rows.column("payload")[0].as_py()
    assert payload[:2] == b"BM"
    img = bmp_decode(payload)
    assert img.shape == (int(img_rows.column("height")[0].as_py()),
                         int(img_rows.column("width")[0].as_py()), 3)
    out = ImageDecodeResize(out_w=8, out_h=8, strict=True)(t)
    feats = np.asarray(out.column("features")[0].as_py(),
                       dtype=np.float32).reshape(3, 8, 8)
    ys = np.arange(8) * img.shape[0] // 8
    xs = np.arange(8) * img.shape[1] // 8
    expect = (img[ys][:, xs].astype(np.float32) / 255.0).transpose(2, 0, 1)
    assert np.array_equal(feats, expect)


def test_audio_decode_is_real_wav(ray_session):
    """Audio payloads are genuine RIFF/WAV and the stage decodes the
    actual PCM samples (stdlib wave), not payload bytes."""
    import io
    import wave

    from search_engine_ray.functions.multimodal import (AudioFrameSample,
                                                        synth_media_table)

    t = synth_media_table(9)
    audio_rows = t.filter(pa.compute.equal(t.column("kind"), "audio"))
    payload = audio_rows.column("payload")[0].as_py()
    assert payload[:4] == b"RIFF"
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnframes() > 0
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    stage = AudioFrameSample(strict=True)  # strict: no fake fallback
    out = stage(t)
    mid = int(audio_rows.column("media_id")[0].as_py())
    got = out.filter(pa.compute.equal(out.column("media_id"), mid))
    # total energy across frames == sum of squared real PCM samples
    assert (sum(got.column("energy").to_pylist())
            == int((pcm.astype(np.int64) ** 2).sum()))


def test_png_codec_roundtrip_and_filters(ray_session):
    """The zero-dep PNG codec: encode→decode roundtrip is exact for RGB
    and RGBA, and the decoder handles ALL five row filters (a payload is
    hand-assembled with one row per filter type and checked against a
    naive per-pixel reference defilter)."""
    import struct
    import zlib

    from search_engine_ray.functions.multimodal import (png_decode,
                                                        png_encode)

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(rgb)), rgb)
    rgba = rng.integers(0, 256, size=(9, 11, 4), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(rgba)), rgba[:, :, :3])

    # hand-filtered payload: rows use filters 0,1,2,3,4 in turn
    h, w, ch = 5, 7, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = img.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        f = y % 5
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        row = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = flat[y][x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc_ else \
                    (b if pb <= pc_ else c)
            row[x] = (flat[y][x] - pred) % 256
        raw.append(f)
        raw.extend(row.astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(payload), img)


def test_image_decode_is_real_png(ray_session):
    """Half the synth image payloads are genuine PNGs and the stage
    features come from the actual pixels."""
    from search_engine_ray.functions.multimodal import (
        ImageDecodeResize, png_decode, synth_media_table)

    t = synth_media_table(12)
    img_rows = t.filter(pa.compute.equal(t.column("kind"), "image"))
    mimes = img_rows.column("mime").to_pylist()
    assert "image/png" in mimes and "image/bmp" in mimes
    i = mimes.index("image/png")
    payload = img_rows.column("payload")[i].as_py()
    img = png_decode(payload)
    assert img.shape == (int(img_rows.column("height")[i].as_py()),
                         int(img_rows.column("width")[i].as_py()), 3)
    out = ImageDecodeResize(out_w=8, out_h=8, strict=True)(t)
    mid = img_rows.column("media_id")[i].as_py()
    row = out.to_pandas().set_index("media_id").loc[mid]
    feats = np.asarray(row["features"], dtype=np.float32).reshape(3, 8, 8)
    ys = np.arange(8) * img.shape[0] // 8
    xs = np.arange(8) * img.shape[1] // 8
    expect = (img[ys][:, xs].astype(np.float32) / 255.0).transpose(2, 0, 1)
    assert np.array_equal(feats, expect)


def test_gif_codec_roundtrip(ray_session):
    """The zero-dep GIF89a codec: palette-index frames → encode →
    decode reproduces the exact palette RGB, across the LZW width-growth
    boundary (>512 dict entries) and the 4096-entry reset."""
    from search_engine_ray.functions.multimodal import (_gif_palette,
                                                        gif_decode,
                                                        gif_encode)

    rng = np.random.default_rng(5)
    pal = _gif_palette()
    # large noisy frame → dictionary blows through 9/10/11/12-bit codes
    frames = [rng.integers(0, 216, size=(60, 90), dtype=np.uint8)
              for _ in range(3)]
    payload = gif_encode(frames, delay_ms=50)
    assert payload[:6] == b"GIF89a"
    out = gif_decode(payload)
    assert len(out) == 3
    for fr, dec in zip(frames, out):
        assert np.array_equal(dec, pal[fr])


def test_video_decode_is_real_gif(ray_session):
    """Video payloads are genuine animated GIFs; the frame-sample stage
    emits one row per sampled frame with features from actual pixels."""
    from search_engine_ray.functions.multimodal import (VideoFrameSample,
                                                        gif_decode,
                                                        media_pipeline,
                                                        synth_media_table)

    t = synth_media_table(9)
    vid_rows = t.filter(pa.compute.equal(t.column("kind"), "video"))
    payload = vid_rows.column("payload")[0].as_py()
    frames = gif_decode(payload)
    assert len(frames) >= 4
    assert frames[0].shape == (
        int(vid_rows.column("height")[0].as_py()),
        int(vid_rows.column("width")[0].as_py()), 3)

    out = VideoFrameSample(out_w=8, out_h=8, stride=2, strict=True)(t)
    df = out.to_pandas()
    mid = vid_rows.column("media_id")[0].as_py()
    got = df[df["media_id"] == mid].sort_values("frame")
    assert got["frame"].tolist() == list(range(0, len(frames), 2))
    img = frames[2]
    ys = np.arange(8) * img.shape[0] // 8
    xs = np.arange(8) * img.shape[1] // 8
    expect = (img[ys][:, xs].astype(np.float32) / 255.0).transpose(2, 0, 1)
    feats = np.asarray(got[got["frame"] == 2]["features"].iloc[0],
                       dtype=np.float32).reshape(3, 8, 8)
    assert np.array_equal(feats, expect.reshape(3, 8, 8))
    # strict mode surfaces the non-GIF stub explicitly
    garbage = synth_media_table(9).set_column(
        2, "payload", pa.array([b"not a gif"] * 9, pa.binary()))
    with pytest.raises(NotImplementedError):
        VideoFrameSample(strict=True)(garbage)
    # the full pipeline runs the video branch
    _, _, video = media_pipeline(24)
    assert video.to_pandas().groupby("media_id").size().min() >= 1


def test_jpeg_codec_roundtrip(ray_session):
    """The zero-dep baseline-JFIF codec: 4:4:4 and 4:2:0 encode→decode
    stay within lossy-compression tolerance on smooth content, exercise
    restart-free Huffman entropy coding across quality levels, and the
    decoder rejects what it does not implement."""
    import pytest as _pytest

    from search_engine_ray.functions.jpeg import jpeg_decode, jpeg_encode

    h, w = 41, 57
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    (xx + yy) * 255 // (w + h - 2)],
                   axis=-1).astype(np.uint8)
    for subsample, tol in ((False, 4), (True, 10)):
        dec = jpeg_decode(jpeg_encode(img, quality=95,
                                      subsample=subsample))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol, (subsample, err.max())
    # noisy content at a lower quality still decodes to the right shape
    rng = np.random.default_rng(1)
    noisy = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(noisy, quality=60))
    assert dec.shape == noisy.shape
    # restart markers: DRI + RSTn byte-aligned resync, DC predictor reset
    for ri in (1, 3):
        d = jpeg_decode(jpeg_encode(img, quality=95,
                                    restart_interval=ri))
        assert np.abs(d.astype(int) - img.astype(int)).max() <= 4
    with _pytest.raises(ValueError):
        jpeg_decode(b"\x00not a jpeg")


def test_image_decode_is_real_jpeg(ray_session):
    """JPEG synth payloads are genuine JFIF and the stage's features
    come from the codec's actual pixel output."""
    from search_engine_ray.functions.jpeg import jpeg_decode
    from search_engine_ray.functions.multimodal import (ImageDecodeResize,
                                                        synth_media_table)

    t = synth_media_table(24)
    img_rows = t.filter(pa.compute.equal(t.column("kind"), "image"))
    mimes = img_rows.column("mime").to_pylist()
    assert "image/jpeg" in mimes
    i = mimes.index("image/jpeg")
    payload = img_rows.column("payload")[i].as_py()
    assert payload[:2] == b"\xff\xd8"
    img = jpeg_decode(payload)
    assert img.shape == (int(img_rows.column("height")[i].as_py()),
                         int(img_rows.column("width")[i].as_py()), 3)
    out = ImageDecodeResize(out_w=8, out_h=8, strict=True)(t)
    mid = img_rows.column("media_id")[i].as_py()
    row = out.to_pandas().set_index("media_id").loc[mid]
    feats = np.asarray(row["features"], dtype=np.float32).reshape(3, 8, 8)
    ys = np.arange(8) * img.shape[0] // 8
    xs = np.arange(8) * img.shape[1] // 8
    expect = (img[ys][:, xs].astype(np.float32) / 255.0).transpose(2, 0, 1)
    assert np.array_equal(feats, expect)


def test_unigram_surprisal_distributed_path(ray_session):
    """Force the hash-partitioned token→count join (vocab_gate=1) and
    pin it identical to the broadcast path AND to the DuckDB oracle —
    the 100-TB shape where the vocabulary never lands on the driver."""
    import duckdb

    from search_engine_ray.functions.textstats import (
        SQL_UNIGRAM_SURPRISAL, unigram_surprisal)

    sf = "/root/testdata/sf0.001"
    broad = unigram_surprisal(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    dist = unigram_surprisal(sf, vocab_gate=1).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert broad.equals(dist[broad.columns])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(SQL_UNIGRAM_SURPRISAL).fetchdf()
    assert dist[["doc_id", "surprisal_milli", "n_tokens"]].equals(
        ora[["doc_id", "surprisal_milli", "n_tokens"]].astype("int64"))


def test_gopher_vectorized_matches_scalar(ray_session):
    """The vectorized gopher_quality batch twin must agree with the
    scalar _gopher_row on every sf doc plus crafted edge cases (empty
    text, duplicate lines, repeated bigrams, symbol runs)."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.functions.textstats import (_gopher_row,
                                                       gopher_quality)

    edge = [
        "", "   ", "a", "x y x y x y x y", "line\nline\nline",
        "# ## ### .... ...", "the and of to in is that for with was",
        "word " * 60, "a\nb\na\nb\nc", "solo\n\n\nsolo",
    ]
    out = gopher_quality("/root/testdata/sf0.001").to_pandas()
    import duckdb
    con = duckdb.connect()
    docs = con.sql("SELECT doc_id, text FROM "
                   "'/root/testdata/sf0.001/documents.parquet' "
                   "ORDER BY doc_id").df()
    out = out.sort_values("doc_id").reset_index(drop=True)
    cols = ["n_words", "mean_word_len_x100", "stopword_hits",
            "symbol_bp", "dup_line_bp", "top_bigram_bp"]
    for i, text in enumerate(docs["text"]):
        assert tuple(out.loc[i, cols]) == _gopher_row(text), i

    # edge cases through the raw batch fn (via a tiny in-memory table)
    import ray.data as rd

    from search_engine_ray.functions import textstats as ts
    tbl = pa.table({"doc_id": pa.array(range(len(edge)), pa.int64()),
                    "text": pa.array(edge, pa.string())})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        got = ts.gopher_quality(d).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
    for i, text in enumerate(edge):
        assert tuple(got.loc[i, cols]) == _gopher_row(text), repr(text)
