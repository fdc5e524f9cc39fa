"""Stronger-than-rows-only checks for operators whose semantics the
DuckDB oracle can't express (seeded hashing, ANN, Arrow UDF stages) —
mirroring the reference's golden-value test philosophy
(`DataTest.scala:106-121`) with computed rather than hand-embedded
goldens."""

from __future__ import annotations

import pytest

from spark_hive_spark.operators.similarity import NEARDUP_COS
from spark_hive_spark.plans.registry import all_queries
from tests.conftest import SF_SMOKE

_Q = all_queries()


def _rows(spark, name, sf=SF_SMOKE):
    return _Q[name].fn(spark, sf).collect()


def test_minhash_lsh_matches_exact_jaccard(spark):
    """MinHash+LSH candidates, after exact verification, must find the
    same >=0.8 pairs as the exhaustive inverted-index query (banding
    miss probability at s>=0.8 is ~2e-4 per pair)."""
    exact = {(r.doc_a, r.doc_b, r.jaccard) for r in _rows(spark, "dedup_ngram_jaccard")}
    lsh = {(r.doc_a, r.doc_b, r.jaccard) for r in _rows(spark, "dedup_minhash_lsh")}
    assert lsh <= exact, f"LSH produced non-dup pairs: {lsh - exact}"
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 10), f"LSH recall too low: missed {missed}"


def test_simhash_pairs_are_near_dups(spark):
    """SimHash pairs: hamming within threshold, ordered ids, and the
    strongest textual near-dups (jaccard >= 0.9) should mostly appear."""
    pairs = _rows(spark, "dedup_simhash")
    for r in pairs:
        assert 0 <= r.hamming <= 3
        assert r.doc_a < r.doc_b
    strong = {
        (r.doc_a, r.doc_b)
        for r in _rows(spark, "dedup_ngram_jaccard")
        if r.jaccard >= 0.9
    }
    if strong:
        found = {(r.doc_a, r.doc_b) for r in pairs}
        recall = len(strong & found) / len(strong)
        assert recall >= 0.5, f"simhash recall on strong dups {recall}"


def test_neardup_lsh_recall_vs_exact(spark):
    """LSH-blocked embedding near-dup: candidates verify with EXACT
    cosine, so every returned pair must appear in the exact all-pairs
    result (precision 1.0 on id pairs; similarities compared with a
    1e-6 tolerance — the two GEMMs are differently blocked, so a pair
    whose true cosine sits within float noise of the threshold or a
    6dp rounding tie must not flake the test), and the 32x4 banding
    puts recall at 0.996 for cos>=0.4 — assert a 0.9 floor to keep the
    test robust to fixture draws."""
    exact_sim = {
        (r.vec_a, r.vec_b): r.cos_sim for r in _rows(spark, "neardup_embeddings")
    }
    lsh_rows = _rows(spark, "neardup_embeddings_lsh")
    lsh_sim = {(r.vec_a, r.vec_b): r.cos_sim for r in lsh_rows}
    extra = {
        p: s
        for p, s in lsh_sim.items()
        if p not in exact_sim and abs(s - NEARDUP_COS) > 1e-6
    }
    assert not extra, f"LSH emitted non-dup pairs: {extra}"
    for p, s in lsh_sim.items():
        if p in exact_sim:
            assert abs(s - exact_sim[p]) <= 1e-6, f"cos mismatch on {p}"
    if exact_sim:
        recall = len(lsh_sim.keys() & exact_sim.keys()) / len(exact_sim)
        assert recall >= 0.9, (
            f"neardup LSH recall {recall} ({len(lsh_sim)}/{len(exact_sim)})"
        )
    # determinism: second run identical
    again = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in _rows(spark, "neardup_embeddings_lsh")
    }
    assert again == {(r.vec_a, r.vec_b, r.cos_sim) for r in lsh_rows}


def test_lsh_knn_recall_vs_bruteforce(spark):
    """ANN: every (query, neighbor) it returns must score exactly the
    brute-force cosine (verification reranks exactly), and recall@5 of
    the true top-5 must clear a floor (vectors are near-random, so LSH
    recall is modest by construction; determinism matters more)."""
    brute = {}
    for r in _rows(spark, "knn_cosine_bruteforce"):
        brute.setdefault(r.query_id, {})[r.neighbor_id] = r.cos_sim
    ann_rows = _rows(spark, "knn_cosine_lsh")
    hits = total = 0
    for q, nbrs in brute.items():
        found = {r.neighbor_id for r in ann_rows if r.query_id == q}
        hits += len(found & set(nbrs))
        total += len(nbrs)
    assert total > 0
    assert hits / total >= 0.2, f"LSH recall@5 {hits}/{total}"
    # determinism: second run identical
    again = _rows(spark, "knn_cosine_lsh")
    assert sorted(map(tuple, ann_rows)) == sorted(map(tuple, again))


def test_ivf_knn_recall_vs_bruteforce(spark):
    """IVF with the k-means coarse quantizer must clear a much higher
    recall floor than LSH (the quantizer adapts to the distribution:
    measured 0.90+ across fixture scales), stay deterministic across
    runs (fixed-seed Lloyd's on a vec_id-ordered sample), and rerank
    exactly."""
    brute = {}
    for r in _rows(spark, "knn_cosine_bruteforce"):
        brute.setdefault(r.query_id, {})[r.neighbor_id] = r.cos_sim
    ann_rows = _rows(spark, "knn_cosine_ivf")
    hits = total = 0
    for q, nbrs in brute.items():
        found = {r.neighbor_id for r in ann_rows if r.query_id == q}
        hits += len(found & set(nbrs))
        total += len(nbrs)
    assert total > 0
    assert hits / total >= 0.8, f"IVF recall {hits}/{total}"
    for r in ann_rows:  # exact rerank: reported cosine == brute cosine
        if r.query_id in brute and r.neighbor_id in brute[r.query_id]:
            assert abs(r.cos_sim - brute[r.query_id][r.neighbor_id]) <= 1e-6
    again = _rows(spark, "knn_cosine_ivf")
    assert sorted(map(tuple, ann_rows)) == sorted(map(tuple, again))


def test_ivf_policy_adaptive_sizing():
    """The adaptive (cells, nprobe) policy (VERDICT r9 task 2) must:
    (1) keep every corpus <= ~48k vectors at the historically attested
    16-cell floor (registered small-SF results stay bit-identical);
    (2) reproduce the SCALE.md sweep winner (32, 16) at 100k vectors
    for the miner's 1/2 probe fraction; (3) hold per-cell size in the
    [target/sqrt2, target*sqrt2) band once off the clamps, so cost
    grows ~N*(constant per-cell GEMM), never a constant fraction of
    N^2; (4) agree exactly with the SQL re-derivation embedded in the
    ann_index_persistence_audit oracle."""
    import duckdb

    from spark_hive_spark.operators.similarity import (
        IVF_CELLS,
        IVF_MAX_CELLS,
        IVF_TARGET_CELL_SIZE,
        ivf_policy,
    )

    assert ivf_policy(20) == (16, 8)
    assert ivf_policy(200) == (16, 8)
    assert ivf_policy(2_000) == (16, 8)
    assert ivf_policy(20_000) == (16, 8)
    assert ivf_policy(2_000, probe_fraction=0.25) == (16, 4)
    # the measured sweep winner at 100k vectors
    assert ivf_policy(100_000) == (32, 16)
    assert ivf_policy(100_000, probe_fraction=0.25) == (32, 8)

    prev_cells = 0
    con = duckdb.connect()
    for n in [1, 100, 2_000, 48_000, 100_000, 10**6, 10**7, 10**9]:
        cells, nprobe = ivf_policy(n)
        assert cells >= prev_cells, "cells must be monotone in N"
        prev_cells = cells
        assert nprobe == max(1, cells // 2)
        if IVF_CELLS < cells < IVF_MAX_CELLS:  # off the clamps
            per_cell = n / cells
            assert (
                IVF_TARGET_CELL_SIZE / 1.415
                <= per_cell
                <= IVF_TARGET_CELL_SIZE * 1.415
            ), (n, cells)
        sql_cells = con.execute(
            f"""SELECT CAST(GREATEST({IVF_CELLS}, LEAST({IVF_MAX_CELLS},
                power(2, GREATEST(0, FLOOR(log2(
                    GREATEST({n}, 1) / {IVF_TARGET_CELL_SIZE}.0) + 0.5)))))
                AS INT)"""
        ).fetchone()[0]
        assert sql_cells == cells, (n, sql_cells, cells)


def test_cogroup_survives_count_pruning(spark):
    """Regression: under .count() the parent demands zero output
    columns and Spark's cogroup attribute dedup used to prune the
    right side's same-named payload column out of the child scan,
    crashing the worker with KeyError. Distinct per-side column names
    keep the payload alive; this pins the count() path bench exercises
    (collect(), which the oracle tests use, never triggered it)."""
    from spark_hive_spark.plans.registry import all_queries

    q = all_queries()["cogroup_click_purchase_latency"]
    assert q.fn(spark, SF_SMOKE).count() >= 0


def test_approx_distinct_close_to_exact(spark):
    """The query now self-reports the HLL++ error check (so the driver
    can hash it): exact counts must agree with the exact-distinct twin
    query, and the within-3σ booleans must hold."""
    exact = {
        r.l_returnflag: (r.n_parts, r.n_orders)
        for r in _rows(spark, "distinct_supplier_part_counts")
    }
    approx = _rows(spark, "approx_distinct_parts")
    assert approx
    for r in approx:
        ex_parts, ex_orders = exact[r.l_returnflag]
        assert (r.exact_parts, r.exact_orders) == (ex_parts, ex_orders)
        assert r.parts_within_3sigma and r.orders_within_3sigma


def test_multimodal_checksum_matches_python(spark):
    """The mapInPandas decode stage's checksum must equal a driver-side
    recomputation from the raw text bytes (validates the Arrow binary
    round-trip byte-for-byte)."""
    from spark_hive_spark.operators.multimodal import decode_media_features, fake_decode
    from spark_hive_spark.tables import t
    import pyspark.sql.functions as F

    docs = t(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 20)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    got = {r.doc_id: r.checksum for r in decode_media_features(media).collect()}
    for row in docs.select("doc_id", "text").collect():
        payload = row.text.encode("utf-8")
        assert got[row.doc_id] == fake_decode(payload)[3]


def test_decode_image_unknown_format_is_explicit_seam():
    """Formats outside the real codecs (BMP/PNG/JPEG/WAV) still hit
    the explicit NotImplementedError seam — here a WebP/RIFF magic.
    A JPEG magic now enters the real decoder instead (and a bare
    truncated SOI fails loudly as a damaged payload, not silently)."""
    from spark_hive_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff")  # truncated JPEG: loud, not seam


def test_bmp_codec_roundtrip():
    """encode_bmp/decode_bmp invert each other, including the cases
    a sloppy parser gets wrong: odd widths (4-byte row padding),
    bottom-up row order, BGR byte order, and top-down negative-height
    files."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for w, h in [(5, 3), (4, 4), (16, 1), (1, 7), (13, 11)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_bmp(px)
        assert blob[:2] == b"BM"
        got = decode_bmp(blob)
        assert got.shape == (h, w, 3)
        assert (got == px).all(), f"roundtrip mismatch at {w}x{h}"
        # dispatch through the generic entry point too
        assert (decode_image(blob) == px).all()
    # asymmetric gradient: catches silent row-flip / channel-swap bugs
    px = np.zeros((3, 5, 3), dtype=np.uint8)
    px[0, :, 0] = 255  # top row pure red
    px[:, 0, 2] = 128  # left column half blue
    got = decode_bmp(encode_bmp(px))
    assert (got == px).all()
    # top-down (negative height) variant decodes too
    blob = bytearray(encode_bmp(px))
    import struct

    struct.pack_into("<i", blob, 22, -3)  # height := -3 (top-down)
    body = np.frombuffer(blob[54:], dtype=np.uint8).reshape(3, -1)
    blob[54:] = body[::-1].tobytes()  # rows now stored top-down
    assert (decode_bmp(bytes(blob)) == px).all()


def test_png_codec_roundtrip():
    """encode_png/decode_png invert each other across sizes that
    exercise all five PNG filter types (encoder writes filter r%5 on
    row r), single-pixel edge cases, and asymmetric content that
    catches row/channel transposition. Decoding also goes through the
    generic decode_image dispatch on the \\x89PNG signature."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        PNG_SIGNATURE,
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (3, 2), (5, 7), (16, 1), (1, 9), (17, 13)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_png(px)
        assert blob[:8] == PNG_SIGNATURE
        got = decode_png(blob)
        assert got.shape == (h, w, 3)
        assert (got == px).all(), f"roundtrip mismatch at {w}x{h}"
        assert (decode_image(blob) == px).all()
    # gradient content: Sub/Average/Paeth predictors all become
    # non-trivial (constant rows make every filter output zeros)
    x = np.arange(7 * 11 * 3, dtype=np.int64).reshape(7, 11, 3)
    px = ((x * 37) % 256).astype(np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


def test_png_codec_rejections():
    """decode_png fails loudly on structurally invalid streams:
    wrong signature, ILLEGAL depth/color-type combinations (the
    legal matrix itself is fully implemented as of round 10 —
    see test_png_variants_roundtrip), corrupt scanline filter
    bytes, truncated IDAT, and palette files missing their PLTE."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        _png_chunk,
        PNG_SIGNATURE,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError):
        decode_png(b"BM not a png")

    def png_with_ihdr(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        idat = zlib.compress(bytes(2 * (1 + 2 * 3)))
        return (
            PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b"")
        )

    # illegal depth/type combos per the spec's table: sub-byte
    # truecolor, 16-bit palette, depth 3, color type 5
    for depth, ctype in [(4, 2), (16, 3), (3, 0), (8, 5)]:
        with pytest.raises(ValueError):
            decode_png(png_with_ihdr(depth, ctype, 0))
    # palette stream without a PLTE chunk
    pal_png = bytearray(
        encode_png(
            np.zeros((2, 2, 3), dtype=np.uint8), palette_depth=8
        )
    )
    i = bytes(pal_png).index(b"PLTE") - 4
    (plen,) = struct.unpack_from(">I", pal_png, i)
    with pytest.raises(ValueError):
        decode_png(bytes(pal_png[:i] + pal_png[i + 12 + plen :]))

    good = encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    # corrupt a filter byte to an undefined type (7): scanline 0's
    # filter byte is the first byte of the inflated stream
    sig_ihdr = good[: 8 + 12 + 13]
    bad_lines = bytearray(3 * (1 + 9))
    bad_lines[0] = 7
    bad = (
        sig_ihdr
        + _png_chunk(b"IDAT", zlib.compress(bytes(bad_lines)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)
    # truncated scanline data (one row short)
    short = (
        sig_ihdr
        + _png_chunk(b"IDAT", zlib.compress(bytes(2 * (1 + 9))))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(short)


def test_png_variants_roundtrip():
    """The full legal PNG matrix must round-trip bit-exactly (PNG is
    lossless): every depth/color-type combination the spec allows —
    gray 1/2/4/8/16 (sub-byte expands by 255/(2^d-1)), RGB 8/16,
    gray+alpha, RGBA, palette 1/2/4/8 with and without tRNS — under
    BOTH interlace layouts (none + Adam7, including degenerate 1-px
    rows/columns where several Adam7 passes are empty). decode_image
    keeps its RGB contract: grayscale replicates, 16-bit scales to
    the high byte, alpha stays loud."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(2711)

    def rt(img, expect=None, **kw):
        expect = img if expect is None else expect
        for interlace in (False, True):
            got = decode_png(encode_png(img, interlace=interlace, **kw))
            assert got.shape == expect.shape and got.dtype == expect.dtype
            assert np.array_equal(got, expect), (img.shape, kw, interlace)

    rt(rng.randint(0, 256, (13, 21, 3)).astype(np.uint8))
    rt(rng.randint(0, 256, (9, 17)).astype(np.uint8))
    rt(rng.randint(0, 65536, (9, 17)).astype(np.uint16))
    rt(rng.randint(0, 65536, (7, 5, 3)).astype(np.uint16))
    rt(rng.randint(0, 256, (11, 6, 2)).astype(np.uint8))
    rt(rng.randint(0, 256, (8, 8, 4)).astype(np.uint8))
    for d in (1, 2, 4):
        raw = rng.randint(0, 1 << d, (10, 13)).astype(np.uint8)
        exp = (raw.astype(np.int64) * 255 // ((1 << d) - 1)).astype(
            np.uint8
        )
        rt(raw, expect=exp, gray_depth=d)
    for d in (1, 2, 4, 8):
        ncol = (1 << d) if d < 8 else 23
        pal = rng.randint(0, 256, (ncol, 3))
        img = pal[rng.randint(0, ncol, (12, 19))].astype(np.uint8)
        rt(img, palette_depth=d)
    apal = np.concatenate(
        [rng.randint(0, 256, (4, 3)), rng.randint(0, 255, (4, 1))], axis=1
    )
    rt(apal[rng.randint(0, 4, (12, 19))].astype(np.uint8), palette_depth=2)
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3)]:
        rt(rng.randint(0, 256, shape).astype(np.uint8))
    # decode_image RGB contract
    g16 = rng.randint(0, 65536, (6, 6)).astype(np.uint16)
    out = decode_image(encode_png(g16))
    assert out.shape == (6, 6, 3) and out.dtype == np.uint8
    assert np.array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))
    with pytest.raises(NotImplementedError):
        decode_image(
            encode_png(rng.randint(0, 256, (6, 6, 4)).astype(np.uint8))
        )


def test_jpeg_codec_closed_form_and_roundtrip():
    """The JPEG codec's two fidelity contracts. (1) Block-constant
    images decode EXACTLY to the closed form the SQL oracle uses
    (recon = clip(2·sign(s)⌊(|s|+1)/2⌋ + 128), s = v−128) — this is
    what makes the lossy codec hash-checkable. (2) Arbitrary images
    round-trip within quantization error: Annex-K quantizers reach
    121, so random noise may move a pixel by ~90, but a smooth
    gradient (energy in low frequencies, small quantizers) must stay
    within a small mean error. Byte stuffing (0xFF00 in the entropy
    stream) must actually occur across the sample and decode cleanly.
    Dispatch via decode_image must replicate gray to 3 RGB planes."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        encode_jpeg,
    )

    for d in (0, 7, 23, 47):
        wb, hb = d % 6 + 2, d % 4 + 2
        vals = (
            d * 7
            + 13 * np.arange(wb)[None, :]
            + 29 * np.arange(hb)[:, None]
        ) % 256
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
            np.uint8
        )
        blob = encode_jpeg(img)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        s = vals.astype(np.int64) - 128
        q = np.sign(s) * ((np.abs(s) + 1) // 2)
        recon = np.clip(2 * q + 128, 0, 255)
        expect = np.repeat(np.repeat(recon, 8, axis=0), 8, axis=1)
        assert (decode_jpeg(blob) == expect).all(), f"doc {d}"
        rgb = decode_image(blob)
        assert rgb.shape == (hb * 8, wb * 8, 3)
        assert (rgb[:, :, 0] == expect).all() and (
            rgb[:, :, 2] == expect
        ).all()

    rng = np.random.default_rng(11)
    stuffed = False
    for _ in range(10):
        img = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
        blob = encode_jpeg(img)
        stuffed = stuffed or b"\xff\x00" in blob
        err = np.abs(
            decode_jpeg(blob).astype(int) - img.astype(int)
        )
        assert err.max() <= 130, "beyond any quantization bound"
    assert stuffed, "sample never exercised byte stuffing"

    x = np.arange(64)[None, :] * 2 + np.arange(32)[:, None] * 3
    img = (x % 256).astype(np.uint8)
    err = np.abs(decode_jpeg(encode_jpeg(img)).astype(int) - img.astype(int))
    assert err.mean() <= 3.0, f"gradient mean err {err.mean()}"


def test_jpeg_color_codec_closed_form_and_margins():
    """Color JPEG's three fidelity contracts. (1) Block-constant RGB
    images decode EXACTLY to the closed form the SQL oracle mirrors
    (BT.601 -> per-channel DC quantize/dequantize -> inverse BT.601,
    floor(x+0.5), clip). (2) Every final-channel value x+0.5 on the
    48-doc fixture stays >= 1e-6 away from an integer boundary, so
    IEEE reassociation differences between numpy's IDCT path and
    DuckDB's expression evaluation can never flip a floor() — the
    margin that makes a LOSSY color codec hash-stable. (3) Noise
    roundtrips within the chroma-quantizer bound."""
    import math

    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        encode_jpeg,
    )

    def closed_form(r, g, b):
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

        def dc(s, qv):
            s8 = round(8 * (s - 128.0), 6)
            return (1 if s8 >= 0 else -1) * math.floor(abs(s8) / qv + 0.5)

        ry = 16 * dc(y, 16) / 8 + 128
        rcb = 17 * dc(cb, 17) / 8 + 128
        rcr = 17 * dc(cr, 17) / 8 + 128
        chans = (
            ry + 1.402 * (rcr - 128),
            ry - 0.344136 * (rcb - 128) - 0.714136 * (rcr - 128),
            ry + 1.772 * (rcb - 128),
        )
        margins = [
            abs((x + 0.5) - round(x + 0.5)) for x in chans
        ]
        clipped = tuple(
            min(255, max(0, math.floor(x + 0.5))) for x in chans
        )
        return clipped, min(margins)

    worst_margin = 1.0
    for d in range(48):
        wb, hb = d % 6 + 2, d % 4 + 2
        bx = np.arange(wb)[None, :]
        by = np.arange(hb)[:, None]
        rr = (d * 7 + 13 * bx + 29 * by) % 256
        gg = (d * 11 + 17 * bx + 31 * by) % 256
        bb = (d * 13 + 19 * bx + 37 * by) % 256
        img = np.stack(
            [np.repeat(np.repeat(c, 8, 0), 8, 1) for c in (rr, gg, bb)],
            axis=2,
        ).astype(np.uint8)
        dec = decode_image(encode_jpeg(img))
        assert dec.shape == (hb * 8, wb * 8, 3)
        for yb in range(hb):
            for xb in range(wb):
                exp, margin = closed_form(
                    int(rr[yb, xb]), int(gg[yb, xb]), int(bb[yb, xb])
                )
                worst_margin = min(worst_margin, margin)
                assert tuple(dec[yb * 8, xb * 8]) == exp, (d, yb, xb)
                # whole block constant
                assert (
                    dec[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                    == np.array(exp)
                ).all()
    assert worst_margin >= 1e-6, f"boundary margin {worst_margin}"

    rng = np.random.default_rng(5)
    for _ in range(4):
        img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        err = np.abs(
            decode_jpeg(encode_jpeg(img)).astype(int) - img.astype(int)
        )
        assert err.max() <= 200, "beyond any chroma-quantization bound"


def test_jpeg_color_rejections_and_gray_passthrough():
    """The color decoder rejects sampling factors beyond 2 loudly
    (a 4:1:1 sampling byte would silently corrupt pixels if
    half-handled), and grayscale payloads still decode through the
    same parser."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    blob = encode_jpeg(img)
    # component 1's sampling byte 0x11 -> 0x41 (a 4:1:1-style frame)
    unsupported = blob.replace(b"\x01\x11\x00", b"\x01\x41\x00", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(unsupported)
    gray = encode_jpeg(np.full((16, 16), 42, dtype=np.uint8))
    assert decode_jpeg(gray).shape == (16, 16)


def test_jpeg_420_codec_closed_form_and_block_order():
    """4:2:0's fidelity contracts. (1) The tile-constant 48-doc
    fixture decodes EXACTLY to the same per-tile closed form as the
    4:4:4 oracle (the 2×2 pairwise box filter of four bitwise-equal
    chroma values is exact), with the same >=1e-6 floor-boundary
    margins. (2) A quadrant-VARYING image — invisible to the oracle
    by design — round-trips with each 8×8 Y-block mean preserved,
    which any in-MCU Y data-unit order bug would break. (3)
    Non-multiple-of-16 dims pad/crop exactly, and 4:2:2 frames
    decode through the same generalized MCU walker."""
    import math

    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_420_fixture_image,
    )

    def closed_form(r, g, b):
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

        def dc(s, qv):
            s8 = round(8 * (s - 128.0), 6)
            return (1 if s8 >= 0 else -1) * math.floor(abs(s8) / qv + 0.5)

        ry = 16 * dc(y, 16) / 8 + 128
        rcb = 17 * dc(cb, 17) / 8 + 128
        rcr = 17 * dc(cr, 17) / 8 + 128
        chans = (
            ry + 1.402 * (rcr - 128),
            ry - 0.344136 * (rcb - 128) - 0.714136 * (rcr - 128),
            ry + 1.772 * (rcb - 128),
        )
        margins = [abs((x + 0.5) - round(x + 0.5)) for x in chans]
        return (
            tuple(min(255, max(0, math.floor(x + 0.5))) for x in chans),
            min(margins),
        )

    worst_margin = 1.0
    for d in range(48):
        img = jpeg_420_fixture_image(d)
        hb, wb = img.shape[0] // 16, img.shape[1] // 16
        assert (wb, hb) == (d % 5 + 2, d % 3 + 2)
        dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
        assert dec.shape == img.shape
        for ty in range(hb):
            for tx in range(wb):
                r, g, b = (int(v) for v in img[ty * 16, tx * 16])
                exp, margin = closed_form(r, g, b)
                worst_margin = min(worst_margin, margin)
                tile = dec[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16]
                assert (tile == np.array(exp)).all(), (d, ty, tx)
    assert worst_margin >= 1e-6, f"boundary margin {worst_margin}"

    # (2) quadrant-varying MCU: per-8×8-block mean fidelity pins the
    # T.81 raster order of the four Y data units
    img = np.full((32, 32, 3), 70, dtype=np.uint8)
    for i, v in enumerate((40, 90, 140, 190)):
        qy, qx = divmod(i, 2)
        img[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8] = v
    dec = decode_jpeg(encode_jpeg(img, subsampling="420"))
    for i, v in enumerate((40, 90, 140, 190)):
        qy, qx = divmod(i, 2)
        got = dec[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8].mean()
        assert abs(got - v) <= 8, (i, v, got)

    # (2b) 4:2:2 / 4:4:0: two Y data units per MCU along the sampled
    # axis — block means pin both the count and the raster order
    img = np.full((8, 16, 3), 70, dtype=np.uint8)
    img[:, :8], img[:, 8:] = 40, 190
    dec = decode_jpeg(encode_jpeg(img, subsampling="422"))
    assert abs(dec[:, :8].mean() - 40) <= 8
    assert abs(dec[:, 8:].mean() - 190) <= 8
    imgv = np.full((16, 8, 3), 70, dtype=np.uint8)
    imgv[:8], imgv[8:] = 40, 190
    decv = decode_jpeg(encode_jpeg(imgv, subsampling="440"))
    assert abs(decv[:8].mean() - 40) <= 8
    assert abs(decv[8:].mean() - 190) <= 8
    # tile-constant fixtures make all sampling geometries decode
    # BIT-IDENTICALLY (the property the 422 query's shared oracle
    # leans on)
    tile = jpeg_420_fixture_image(5)
    base = decode_jpeg(encode_jpeg(tile, subsampling="420"))
    for sub in ("422", "440", "444"):
        assert np.array_equal(
            base, decode_jpeg(encode_jpeg(tile, subsampling=sub))
        ), sub

    # (3) non-multiple-of-16 dims now pad by edge replication: a
    # constant frame's padding blocks are the same constant, so the
    # decoded crop is the constant's closed-form reconstruction
    c420 = decode_jpeg(
        encode_jpeg(np.full((24, 24, 3), 99, dtype=np.uint8),
                    subsampling="420")
    )
    assert c420.shape == (24, 24, 3)
    assert (c420 == c420[0, 0]).all()
    # 4:2:2 through the same walker
    blob = encode_jpeg(np.full((16, 32, 3), 99, dtype=np.uint8))
    sub422 = blob.replace(b"\x01\x11\x00", b"\x01\x21\x00", 1)
    # 4:2:2 sampling byte with a 4:4:4 stream desyncs -> loud error,
    # never silent garbage acceptance of a half-parsed frame
    with pytest.raises(ValueError):
        decode_jpeg(sub422)


def test_jpeg_codec_rejections():
    """decode_jpeg fails loudly on what it cannot faithfully decode:
    missing SOI, truncated segments, truncated entropy stream,
    malformed progressive scan structure, and lossless (SOF3)
    frames. 8-bit extended-sequential (SOF1) decodes identically to
    SOF0 (round 10), and AC successive-approximation refinement IS
    implemented (see test_jpeg_progressive_matches_baseline); here we
    only assert its scan script really is multi-scan. Partial support
    would silently corrupt pixels."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    with pytest.raises(ValueError):
        decode_jpeg(b"BM not a jpeg")
    good = encode_jpeg(np.full((16, 16), 77, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 3])  # truncated mid-tables
    with pytest.raises(ValueError):
        decode_jpeg(good[:-3])  # EOI gone -> truncated entropy/EOI
    # a baseline stream relabeled SOF2 is MALFORMED progressive (its
    # single interleaved scan claims Ss=0..Se=63; progressive DC
    # scans must have Se=0) -> loud structural error, never a
    # half-parsed frame
    with pytest.raises(ValueError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # extended sequential (SOF1) at 8-bit is decode-identical to
    # SOF0 (round 10) — relabeling the frame must not change pixels
    assert (
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc1", 1))
        == decode_jpeg(good)
    ).all()
    # lossless (SOF3) stays a loud seam
    with pytest.raises(NotImplementedError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3", 1))
    # the full-SA scan script really is multi-scan (FF DA cannot occur
    # inside entropy data — 0xFF is always stuffed)
    prog = encode_jpeg_progressive(
        np.full((16, 16), 77, dtype=np.uint8), ac_successive=True
    )
    assert prog.count(b"\xff\xda") == 6  # DC x2 + AC first x2 + refine x2


def test_jpeg_progressive_matches_baseline():
    """The progressive scan schedule (DC successive approximation +
    two spectral-selection AC bands per component) must reconstruct
    pixels BIT-IDENTICAL to the baseline encoding of the same image:
    both quantize identically, so any difference is an entropy-coder
    or scan-assembly bug. Pseudorandom images exercise nonzero AC
    coefficients, ZRL runs, and cross-block EOBn runs; the marker
    walk asserts the stream really is multi-scan SOF2."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(4117)
    for shape in [(16, 24), (8, 8), (32, 16, 3), (24, 24, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img))
        prog_blob = encode_jpeg_progressive(img)
        assert np.array_equal(base, decode_jpeg(prog_blob)), shape
        # full successive approximation on AC too (T.81 G.1.2.3:
        # newly-significant symbols, inline correction bits, EOB-run
        # corrections) must still be bit-identical to baseline
        sa_blob = encode_jpeg_progressive(img, ac_successive=True)
        assert np.array_equal(base, decode_jpeg(sa_blob)), (shape, "sa")
    # EOB-run-with-corrections stress: near-constant frame with a few
    # isolated spikes (long cross-block EOB runs carrying correction
    # bits for history coefficients)
    img = np.full((48, 48), 100, dtype=np.uint8)
    img[13, 29] = 240
    img[40, 7] = 3
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img)),
        decode_jpeg(encode_jpeg_progressive(img, ac_successive=True)),
    )


def test_jpeg_multiscan_and_restart_markers():
    """Sequential-JPEG layout variants must decode bit-identical to
    the interleaved single-scan encoding of the same image (same
    quantized coefficients, different entropy layout): DRI/RSTn
    restart intervals (including interval 1 — a marker after every
    MCU — and intervals spanning the RSTn modulo-8 wraparound),
    multi-scan non-interleaved color (three SOS scans, per-scan DC
    predictors), their composition, and both knobs on 4:2:0 and
    odd-dimension frames. A truncated restart sequence fails
    loudly."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(1653)
    for shape in [(16, 16), (13, 21), (24, 40, 3), (18, 34, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img))
        for ri in (1, 2, 5, 17):
            got = decode_jpeg(encode_jpeg(img, restart_interval=ri))
            assert np.array_equal(base, got), (shape, ri)
        if len(shape) == 3:
            ms = decode_jpeg(encode_jpeg(img, multi_scan=True))
            assert np.array_equal(base, ms), (shape, "ms")
            both = decode_jpeg(
                encode_jpeg(
                    img, multi_scan=True, restart_interval=3,
                    dqt_16bit=True,
                )
            )
            assert np.array_equal(base, both), (shape, "ms+rst+16")
    img = rng.randint(0, 256, (20, 36, 3)).astype(np.uint8)
    base420 = decode_jpeg(encode_jpeg(img, subsampling="420"))
    got420 = decode_jpeg(
        encode_jpeg(img, subsampling="420", restart_interval=2)
    )
    assert np.array_equal(base420, got420)
    # multi_scan needs three components to split
    with pytest.raises(ValueError):
        encode_jpeg(
            rng.randint(0, 256, (16, 16)).astype(np.uint8),
            multi_scan=True,
        )
    # chop the stream mid-restart-sequence: loud, never half a frame
    blob = encode_jpeg(
        rng.randint(0, 256, (32, 32)).astype(np.uint8),
        restart_interval=1,
    )
    first_rst = blob.index(b"\xff\xd0")
    with pytest.raises(ValueError):
        decode_jpeg(blob[: first_rst + 2])


def test_jpeg_partial_mcu_and_16bit_dqt():
    """Non-MCU-multiple dims (the common real-file case — photos are
    almost never multiples of 16) and Pq=1 two-byte quant tables.
    Contracts: (1) decode(encode(img)) must equal decode(encode(
    edge-padded img)) cropped — exact by construction, because the
    encoder pads by edge replication and the decoder crops the padded
    reconstruction; (2) progressive encodings of odd-dim images
    (both AC modes) decode bit-identical to baseline; (3) a 16-bit
    DQT stream with the same table values decodes bit-identical to
    the 8-bit stream; (4) a malformed Pq>1 nibble fails loudly."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        _jpeg_pad_edge,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(2218)
    cases = [
        ((13, 21), "444", 8),
        ((30, 50), "444", 8),
        ((1, 1), "444", 8),
        ((18, 34, 3), "444", 8),
        ((20, 36, 3), "420", 16),
        ((7, 100, 3), "420", 16),
        # per-axis MCU padding: 4:2:2 pads (8, 16), 4:4:0 pads (16, 8)
        ((20, 36, 3), "422", (8, 16)),
        ((7, 100, 3), "422", (8, 16)),
        ((20, 36, 3), "440", (16, 8)),
        ((9, 33, 3), "440", (16, 8)),
    ]
    for shape, sub, mult in cases:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert got.shape[:2] == shape[:2], (shape, sub)
        ref = decode_jpeg(encode_jpeg(_jpeg_pad_edge(img, mult),
                                      subsampling=sub))
        assert np.array_equal(got, ref[: shape[0], : shape[1]]), (shape, sub)
    for shape in [(13, 21), (9, 9), (18, 34, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img))
        for sa in (False, True):
            prog = decode_jpeg(encode_jpeg_progressive(img, ac_successive=sa))
            assert np.array_equal(base, prog), (shape, sa)
    for shape in [(16, 16), (13, 21), (18, 34, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        blob8 = encode_jpeg(img)
        blob16 = encode_jpeg(img, dqt_16bit=True)
        assert len(blob16) > len(blob8)  # 64 extra bytes per table
        assert np.array_equal(decode_jpeg(blob8), decode_jpeg(blob16))
    bad = encode_jpeg(np.full((8, 8), 7, dtype=np.uint8))
    # DQT body starts right after the FFDB marker + 2-byte length:
    # corrupt the Pq nibble to 2 -> loud structural error
    i = bad.index(b"\xff\xdb") + 4
    with pytest.raises(ValueError):
        decode_jpeg(bad[:i] + bytes([0x20 | bad[i]]) + bad[i + 1 :])
    # structure: SOF2 frame, 4 scans for grayscale / 8 for color
    # (1 DC first + 1 DC refine + 2 AC bands x ncomp)
    gray = encode_jpeg_progressive(
        rng.randint(0, 256, (16, 16)).astype(np.uint8)
    )
    color = encode_jpeg_progressive(
        rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    )
    assert b"\xff\xc2" in gray and b"\xff\xc0" not in gray[2:-2]
    assert gray.count(b"\xff\xda") == 4
    assert color.count(b"\xff\xda") == 8
    # smooth gradient: progressive lossy error stays within the same
    # bound pinned for the baseline path
    xs = np.linspace(0, 255, 64)
    grad = np.clip(
        xs[None, :] * 0.5 + xs[:, None] * 0.5, 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_progressive(grad)).astype(np.float64)
    assert abs(dec - grad).mean() < 4.0


def test_asof_join_generic_semantics(spark):
    """Hand-checkable asof: every purchase's matched click is the max
    click_ts <= purchase ts for that user (verified against a
    per-user python scan)."""
    from spark_hive_spark.tables import t
    import pyspark.sql.functions as F

    ev = t(spark, SF_SMOKE, "events")
    rows = _rows(spark, "asof_purchase_last_click")
    clicks = {}
    for r in (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .collect()
    ):
        clicks.setdefault(r.user_id, []).append(r.ts)
    for r in rows[:200]:
        prior = [ts for ts in clicks.get(r.user_id, []) if ts <= r.ts]
        assert prior, f"purchase {r.event_id} matched but no prior click exists"
        assert max(prior) == r.click_ts


def test_shard_keep_rate_non_numeric_source(spark):
    """Mixture shard parsing must not throw under ANSI mode on source
    names without digits (or with digits not at a fixed offset) — they
    deterministically land in the odd/5% class."""
    from spark_hive_spark.operators.curation import _EVEN_PCT, _ODD_PCT, shard_keep_rate

    df = spark.createDataFrame(
        [("web_04",), ("crawl-117",), ("books",), ("wiki_dump",), ("s2",)],
        "source string",
    )
    got = {r.source: r.rate for r in df.select("source", shard_keep_rate().alias("rate")).collect()}
    assert got == {
        "web_04": _EVEN_PCT,
        "crawl-117": _ODD_PCT,
        "books": _ODD_PCT,
        "wiki_dump": _ODD_PCT,
        "s2": _EVEN_PCT,
    }


def test_duplicate_clusters_raises_when_budget_exhausted(spark):
    """Label propagation must fail loudly, not return wrong labels,
    when the iteration budget is smaller than the cluster diameter
    (simulated by max_iters=1 on the real pair graph, which needs at
    least one label-changing round plus a confirming round)."""
    from spark_hive_spark.operators.dedup import dedup_duplicate_clusters

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_duplicate_clusters(spark, SF_SMOKE, max_iters=1)


def test_asof_join_null_payload_not_mixed(spark):
    """Regression: a genuine NULL in one right payload column must NOT
    be backfilled from an EARLIER right row — all payload columns come
    from the single matched row (the struct-backfill contract)."""
    import datetime as dt

    from spark_hive_spark.operators.temporal import asof_join

    ts = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, ts(3), "L")], "k int, lts timestamp, lbl string")
    right = spark.createDataFrame(
        [(1, ts(1), 10, "x"), (1, ts(2), None, "y")],
        "k int, rts timestamp, a int, b string",
    )
    rows = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", how="inner"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.rts == ts(2) and r.b == "y"
    assert r.a is None, f"payload mixed across right rows: a={r.a}"


def test_watermark_append_subset_of_complete(spark):
    """Append-mode watermarked windows must be a subset of the
    complete batch result (only closed windows emit, with final
    counts)."""
    complete = {
        (r.window_start, r.event_type): r.n_events
        for r in _rows(spark, "window_tumbling_events")
    }
    appended = _rows(spark, "stream_watermarked_windows")
    assert appended, "watermarked query emitted nothing"
    for r in appended:
        assert complete.get((r.window_start, r.event_type)) == r.n_events
    assert len(appended) < len(complete), "append mode should hold back open windows"


def test_ivf_knn_recall_and_determinism(spark):
    """IVF ANN: exact scores for whatever it returns (rerank is
    exact), nonzero overlap with brute-force top-5, deterministic."""
    brute = {}
    for r in _rows(spark, "knn_cosine_bruteforce"):
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf = _rows(spark, "knn_cosine_ivf")
    assert ivf, "IVF returned nothing"
    hits = sum(
        1 for r in ivf if r.neighbor_id in brute.get(r.query_id, set())
    )
    assert hits >= len(brute)  # avg >= 1 true neighbor per query
    again = _rows(spark, "knn_cosine_ivf")
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, again))


def test_approx_percentile_close_to_exact(spark):
    """approx_percentile (the bounded-memory 100 TB path) must land
    within 2% relative of the exact per-group percentiles."""
    import pyspark.sql.functions as F
    from spark_hive_spark.tables import t

    li = t(spark, SF_SMOKE, "lineitem")
    exact = {
        r.l_returnflag: (r.p50, r.p95)
        for r in _rows(spark, "percentiles_extendedprice")
    }
    approx = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("a50"),
            F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("a95"),
        )
        .collect()
    )
    for r in approx:
        e50, e95 = exact[r.l_returnflag]
        assert abs(r.a50 - e50) / e50 < 0.02
        assert abs(r.a95 - e95) / e95 < 0.02


def test_hll_merge_equals_direct_and_bounds_error(spark):
    """Mergeability is the whole point of sketches: the two-level
    (daily -> union) rollup must produce the SAME estimate as one
    direct pass (same lgK, same hash — merging loses nothing), and
    both must sit within ~5 standard errors (lgK=12 -> rse ~1.6%)
    of the exact distinct count."""
    import pyspark.sql.functions as F

    from spark_hive_spark.operators.sketches import HLL_LGK
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    rolled = {
        r["event_type"]: r
        for r in all_queries()["sketch_hll_mergeable_rollup"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    # independent recomputation of the exact distinct counts
    exact = {
        r["event_type"]: r["ex"]
        for r in t(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ex"))
        .collect()
    }
    assert rolled, "no event types"
    assert HLL_LGK == 12  # docstring error math assumes 2^12 registers
    for et, row in rolled.items():
        # the query self-reports both invariants so the driver can
        # hash them; re-assert here plus the exact count against an
        # independent aggregation
        assert row["merged_eq_direct"], f"{et}: merged != direct estimate"
        assert row["within_err"], f"{et}: estimate outside error envelope"
        assert row["exact_users"] == exact[et]


def test_rfm_approx_agrees_with_exact(spark):
    """The approx-quantile RFM (scale path, no global sort) must track
    the exact-ntile RFM everywhere ntile's answer is well-defined.
    Where metric values TIE, exact ntile splits the tie arbitrarily
    (forced equal-size buckets, user_id tie-break) while edge
    bucketing keeps equal values together — so the contract is:
    (1) equal metric value => equal approx bucket (value consistency,
    a property the exact ntile cannot offer), (2) monotone buckets in
    the metric, (3) >=90% agreement with exact on tie-free values.
    Run at sf0.01 (150 purchasing users) — the sf0.001 smoke set has
    15, all boundary."""
    import collections

    sf = "/root/testdata/sf0.01"
    exact = {
        r["user_id"]: r
        for r in all_queries()["rfm_user_scores"].fn(spark, sf).collect()
    }
    approx = all_queries()["rfm_user_scores_approx"].fn(spark, sf).collect()
    assert len(approx) == len(exact) > 0

    for metric, col, reverse in (
        ("recency_days", "r_bucket", False),
        ("frequency", "f_bucket", True),
        ("monetary", "m_bucket", True),
    ):
        # (1) value consistency
        by_val = collections.defaultdict(set)
        for r in approx:
            by_val[r[metric]].add(r[col])
        assert all(len(s) == 1 for s in by_val.values()), f"{col} splits a tie"

        # (2) monotonicity
        ordered = sorted(approx, key=lambda r: r[metric], reverse=reverse)
        buckets = [r[col] for r in ordered]
        assert buckets == sorted(buckets), f"{col} not monotone in {metric}"

        # (3) tie-free agreement with the exact twin
        counts = collections.Counter(r[metric] for r in approx)
        tie_free = [r for r in approx if counts[r[metric]] == 1]
        if tie_free:
            agree = sum(
                1 for r in tie_free if r[col] == exact[r["user_id"]][col]
            )
            rate = agree / len(tie_free)
            assert rate >= 0.9, f"{col}: tie-free agreement {rate:.2f} < 0.9"


def test_wav_codec_roundtrip_identity():
    """encode_wav -> decode_wav must be the identity on int16 sample
    arrays (container framing, endianness, sample width) — including
    the full-scale extremes and odd lengths."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import decode_wav, encode_wav

    for samples in (
        np.array([0, 1, -1, 32767, -32768], dtype=np.int16),
        (np.arange(333, dtype=np.int64) * 997 % 65536 - 32768).astype(np.int16),
    ):
        rate, back = decode_wav(encode_wav(samples))
        assert rate == 16000
        assert back.dtype == np.dtype("<i2")
        assert (back == samples).all()


def test_wav_decode_rejects_non_mono():
    """The decoder must refuse containers that aren't mono PCM16
    rather than silently mis-reading frames."""
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from spark_hive_spark.operators.multimodal import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(8, dtype="<i2").tobytes())
    with _pytest.raises(ValueError):
        decode_wav(buf.getvalue())


def test_avro_schema_resolution_rules():
    """Avro 1.11 record resolution: name matching across reorders,
    skip-with-consume of writer-only fields, reader defaults,
    long->double promotion; incompatible types and defaultless
    missing fields fail loudly."""
    import pytest as _pytest

    from spark_hive_spark.operators.avro import (
        _AVRO_READER,
        _AVRO_W1,
        _AVRO_W2,
        encode_avro_ocf,
        parse_avro_ocf,
    )

    v1 = encode_avro_ocf(
        [{"id": 1, "name": "abc", "score": 0.5},
         {"id": 2, "name": "de", "score": 1.5}],
        _AVRO_W1,
    )
    _, recs = parse_avro_ocf(v1, _AVRO_READER)
    assert recs == [
        {"id": 1, "name": "abc", "weight": 0.25},
        {"id": 2, "name": "de", "weight": 0.25},
    ]
    v2 = encode_avro_ocf(
        [{"name": "xyz", "weight": 7, "id": 3, "score": 2.5}],
        _AVRO_W2,
        codec="deflate",
    )
    _, recs2 = parse_avro_ocf(v2, _AVRO_READER)
    assert recs2 == [{"name": "xyz", "weight": 7.0, "id": 3}]
    assert isinstance(recs2[0]["weight"], float)  # promoted, not long
    with _pytest.raises(ValueError, match="incompatible"):
        parse_avro_ocf(
            v1,
            {"type": "record", "name": "M",
             "fields": [{"name": "id", "type": "string"}]},
        )
    with _pytest.raises(ValueError, match="no default"):
        parse_avro_ocf(
            v1,
            {"type": "record", "name": "M",
             "fields": [{"name": "zz", "type": "long"}]},
        )


def test_g711_expansion_matches_spec_landmarks():
    """The hand-built G.711 expanders must hit the spec's canonical
    values: μ-law code 0xFF (all-ones wire) is silence (0), code 0x00
    is the negative extreme −32124, code 0x80 the positive +32124;
    A-law 0x55 (wire toggle of 0) is −8, 0xAA the positive extreme
    +32256; and each law's 256-entry table is antisymmetric in the
    sign bit."""
    from spark_hive_spark.operators.multimodal import (
        _g711_alaw_to_linear,
        _g711_ulaw_to_linear,
    )

    assert _g711_ulaw_to_linear(0xFF) == 0
    assert _g711_ulaw_to_linear(0x7F) == -0  # negative silence is 0 too
    assert _g711_ulaw_to_linear(0x00) == -32124
    assert _g711_ulaw_to_linear(0x80) == 32124
    assert _g711_alaw_to_linear(0x55) == -8
    assert _g711_alaw_to_linear(0xD5) == 8
    assert _g711_alaw_to_linear(0x2A) == -32256
    assert _g711_alaw_to_linear(0xAA) == 32256
    for c in range(128):
        # flipping the (pre-complement / pre-toggle) sign bit negates
        assert _g711_ulaw_to_linear(c) == -_g711_ulaw_to_linear(c | 0x80)
        assert _g711_alaw_to_linear(c) == -_g711_alaw_to_linear(c ^ 0x80)


def test_g711_wav_container_roundtrip_and_rejections():
    """encode_g711_wav -> decode_g711_wav must recover every codeword
    through the table (both laws, odd length exercising the RIFF pad
    byte), and the parser must refuse PCM WAVs and truncated RIFFs."""
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from spark_hive_spark.operators.multimodal import (
        _g711_alaw_to_linear,
        _g711_ulaw_to_linear,
        decode_g711_wav,
        encode_g711_wav,
    )

    codes = bytes(range(256)) + b"\x07"  # odd length -> pad byte
    for tag, law, fn in (
        (7, "ulaw", _g711_ulaw_to_linear),
        (6, "alaw", _g711_alaw_to_linear),
    ):
        got_law, rate, pcm = decode_g711_wav(encode_g711_wav(codes, tag))
        assert (got_law, rate, len(pcm)) == (law, 8000, 257)
        want = np.array([fn(c) for c in codes], dtype=np.int16)
        assert (pcm == want).all()
    with _pytest.raises(ValueError):
        encode_g711_wav(b"\x00", 1)  # PCM is not G.711
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(8, dtype="<i2").tobytes())
    with _pytest.raises(ValueError):
        decode_g711_wav(buf.getvalue())  # PCM16 container rejected
    with _pytest.raises(ValueError):
        decode_g711_wav(encode_g711_wav(codes, 7)[:-3])  # truncated


def test_pagerank_is_a_probability_vector(spark):
    """Teleport floor and (near-)stochasticity: every rank >=
    (1-d)/N, and the ranks sum to <= 1 + eps (equality when no rank
    mass leaks through dangling nations; the fixture graph has every
    nation trading, so the sum should be ~1)."""
    rows = _rows(spark, "pagerank_nation_trade")
    assert len(rows) == 25
    floor = (1 - 0.85) / 25
    total = sum(r.pagerank for r in rows)
    for r in rows:
        assert r.pagerank >= floor - 1e-9
    assert 0.99 <= total <= 1.0 + 1e-6


def test_table_checksum_detects_single_cell_damage(spark):
    """The row fingerprint must flip when any one cell changes — the
    property that makes the checksum a migration validation rather
    than a row count."""
    from pyspark.sql import functions as F

    fp = (
        "CAST(conv(substring(md5(concat(c_custkey, '|', c_name)), 1, 15),"
        " 16, 10) AS BIGINT) % 1000000007"
    )
    base = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "c_custkey long, c_name string"
    )
    damaged = spark.createDataFrame(
        [(1, "alice"), (2, "bub")], "c_custkey long, c_name string"
    )
    s0 = base.select(F.expr(fp).alias("f")).agg(F.sum("f")).collect()[0][0]
    s1 = damaged.select(F.expr(fp).alias("f")).agg(F.sum("f")).collect()[0][0]
    assert s0 != s1


def test_fuzzy_length_band_loses_no_pairs(spark):
    """|len(a)-len(b)| <= d lower-bounds Levenshtein, so the banded
    join must return exactly the pairs the unbanded within-block scan
    finds."""
    from pyspark.sql import functions as F

    from spark_hive_spark.tables import t

    names = (
        t(spark, SF_SMOKE, "part").select("p_name").distinct().collect()
    )
    vocab = sorted(r.p_name for r in names)
    import itertools

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expected = {
        (a, b)
        for a, b in itertools.combinations(vocab, 2)
        if a.split()[1] == b.split()[1] and lev(a, b) <= 3
    }
    got = {
        (r.name_a, r.name_b)
        for r in _rows(spark, "fuzzy_levenshtein_part_pairs")
    }
    assert got == expected


def test_reservoir_sample_sizes_and_stability(spark):
    """Exactly min(5, |group|) rows per nation, and the selection is a
    pure function of the data — identical under a different input
    partitioning."""
    from spark_hive_spark.tables import t

    rows = _rows(spark, "reservoir_per_key_sample")
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r.c_custkey)
    cust = t(spark, SF_SMOKE, "customer")
    nat = t(spark, SF_SMOKE, "nation")
    sizes = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .count()
        .collect()
    )
    group_size = {r.n_name: r["count"] for r in sizes}
    for nation, picked in by_nation.items():
        assert len(picked) == min(5, group_size[nation])
    rerun = _rows(spark, "reservoir_per_key_sample")
    assert [(r.n_name, r.c_custkey) for r in rerun] == [
        (r.n_name, r.c_custkey) for r in rows
    ]


def test_cogroup_bucket_count_is_pure_performance_knob(spark, monkeypatch):
    """The cogroup bucket fan-out amortizes per-group framework cost;
    it must never change results — same rows under 64 and 5 buckets."""
    import spark_hive_spark.operators.udfs as udfs

    base = _rows(spark, "cogroup_click_purchase_latency")
    monkeypatch.setattr(udfs, "COGROUP_BUCKETS", 5)
    alt = _rows(spark, "cogroup_click_purchase_latency")
    assert [tuple(r) for r in base] == [tuple(r) for r in alt]


def test_pca_power_iteration_matches_single_node(spark):
    """The distributed matvec must equal a single-node numpy run of
    the identical algorithm (same init, same iteration count) to
    float64 reduction noise — the distribution changes the summation
    ORDER only, never the math."""
    import numpy as np

    from spark_hive_spark.operators.similarity import PCA_ITERS
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    emb = t(spark, SF_SMOKE, "embeddings")
    X = np.stack(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in emb.select("embedding").collect()
        ]
    )
    dim = X.shape[1]
    v = np.ones(dim) / np.sqrt(dim)
    lam = None
    for _ in range(PCA_ITERS):
        w = X.T @ (X @ v)
        lam = float(v @ w)
        v = w / np.linalg.norm(w)
    # the registered query recomputes distributedly; compare its
    # invariants and the local lambda against the analytic eigenvalue
    row = (
        all_queries()["embedding_pca_power_iteration"]
        .fn(spark, SF_SMOKE)
        .collect()[0]
    )
    assert row.n_vectors == X.shape[0] and row.dim == dim
    assert (
        row.unit_norm_ok
        and row.lambda_positive
        and row.lambda_le_trace
        and row.rayleigh_monotone
    )
    evals = np.linalg.eigvalsh(X.T @ X)
    # after PCA_ITERS rounds the Rayleigh quotient must sit inside
    # (0, lambda_max]; with random-ish data it lands within a few
    # percent of the top eigenvalue
    assert lam <= evals[-1] * (1 + 1e-9)
    assert lam >= 0.5 * evals[-1]


def test_cusum_closed_form_matches_direct_recursion(spark):
    """The registered CUSUM query uses the prefix-sum identity
    S_i = P_i - min(0, min_{j<=i} P_j); recompute S by the literal
    max(0, S_{i-1} + z - k) recursion from the same daily series and
    demand agreement to the query's 4dp output."""
    import duckdb

    from spark_hive_spark.operators.timeseries import CUSUM_K
    from spark_hive_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE
    from spark_hive_spark.tables import table_path

    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM '{table_path(SF_SMOKE, "orders")}'
        GROUP BY day ORDER BY day
        """
    ).fetchall()
    xs = [x for _, x in daily]
    n = len(xs)
    mu = sum(xs) / n
    var = (sum(v * v for v in xs) - sum(xs) ** 2 / n) / (n - 1)
    sd = var**0.5
    s, by_day = 0.0, {}
    for (day, x) in daily:
        s = max(0.0, s + (x - mu) / sd - CUSUM_K)
        by_day[day.strftime("%Y-%m-%d")] = s
    rows = (
        all_queries()["cusum_changepoint_daily_revenue"]
        .fn(spark, SF_SMOKE)
        .collect()
    )
    assert rows, "cusum query returned nothing"
    for r in rows:
        assert abs(by_day[r.day] - r.cusum_pos) < 1e-3, (
            r.day,
            by_day[r.day],
            r.cusum_pos,
        )


def test_sweepline_peak_matches_bruteforce_minute_scan(spark):
    """Peak concurrency per day from the sweep-line query must equal a
    literal per-minute occupancy count over the sessionized intervals
    (recomputed independently in Python)."""
    from collections import defaultdict
    from datetime import timedelta

    from spark_hive_spark.operators.timeseries import SESSION_GAP_US
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    ev = sorted(
        t(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    # sessionize per user with the same gap
    sessions = []
    cur = None
    for r in ev:
        if (
            cur is None
            or r.user_id != cur[0]
            or (r.ts - cur[2]).total_seconds() * 1e6 > SESSION_GAP_US
        ):
            if cur is not None:
                sessions.append((cur[1], cur[2]))
            cur = [r.user_id, r.ts, r.ts]
        else:
            cur[2] = r.ts
    if cur is not None:
        sessions.append((cur[1], cur[2]))
    # brute-force minute occupancy: [trunc(sm), trunc(em)+1min)
    occ = defaultdict(int)
    for sm, em in sessions:
        m = sm.replace(second=0, microsecond=0)
        end = em.replace(second=0, microsecond=0) + timedelta(minutes=1)
        while m < end:
            occ[m] += 1
            m += timedelta(minutes=1)
    peak_by_day = defaultdict(int)
    for m, c in occ.items():
        d = m.strftime("%Y-%m-%d")
        peak_by_day[d] = max(peak_by_day[d], c)
    rows = (
        all_queries()["concurrency_peak_sweepline"].fn(spark, SF_SMOKE).collect()
    )
    got = {r.day: r.peak_concurrency for r in rows}
    assert got == dict(peak_by_day)


def test_proration_exact_on_adversarial_orders(spark):
    """Largest-remainder allocation must sum exactly to the order
    total even when every share ties on the remainder and the total
    is not a multiple of the line count — crafted here, checked
    through the same cent-integer pipeline as the registered query."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [
        # order 1: 100.01 over 3 equal weights -> 33.34/33.34/33.33
        (1, 1, 10.0, 10001),
        (1, 2, 10.0, 10001),
        (1, 3, 10.0, 10001),
        # order 2: 0.05 over 2 very unequal weights
        (2, 1, 999.99, 5),
        (2, 2, 0.01, 5),
        # order 3: single line gets everything
        (3, 1, 123.45, 77777),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, w double, total_c long"
    ).withColumn("w_c", F.round(F.col("w") * 100, 0).cast("bigint"))
    ow = W.partitionBy("l_orderkey")
    d = (
        df.withColumn("wsum", F.sum("w_c").over(ow))
        .withColumn("q", F.expr("(total_c * w_c) DIV wsum"))
        .withColumn("rem", F.expr("(total_c * w_c) % wsum"))
        .withColumn(
            "rk", F.row_number().over(ow.orderBy(F.desc("rem"), "l_linenumber"))
        )
        .withColumn("qsum", F.sum("q").over(ow))
        .withColumn(
            "alloc_c",
            F.col("q")
            + F.when(F.col("rk") <= F.col("total_c") - F.col("qsum"), 1)
            .otherwise(0),
        )
    )
    per_order = {
        r.l_orderkey: (r.alloc, r.total)
        for r in d.groupBy("l_orderkey")
        .agg(
            F.sum("alloc_c").alias("alloc"), F.max("total_c").alias("total")
        )
        .collect()
    }
    assert all(a == t_ for a, t_ in per_order.values()), per_order
    # the equal-weight ties break by line number: lines 1,2 get the cent
    allocs = {
        (r.l_orderkey, r.l_linenumber): r.alloc_c for r in d.collect()
    }
    assert allocs[(1, 1)] == 3334 and allocs[(1, 2)] == 3334
    assert allocs[(1, 3)] == 3333


def test_gini_bounds_and_lorenz_shape(spark):
    """Gini in [0,1); cumulative Lorenz shares strictly increasing and
    ending at 1; registered-query output at smoke scale."""
    from spark_hive_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["gini_customer_revenue"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    g = rows[0].gini
    assert 0.0 <= g < 1.0 and all(r.gini == g for r in rows)
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares) and abs(shares[-1] - 1.0) < 1e-9
    # Lorenz curve lies under the diagonal (ascending-rank deciles)
    for i, s in enumerate(shares[:-1], start=1):
        assert s <= i / 10 + 1e-9


def test_bfs_hops_satisfy_frontier_property(spark):
    """Every node at hop d>0 must have a neighbor at hop d-1, the hub
    is at 0, and no settled hop can be improved through any edge
    (relaxation fixpoint) — checked against an independently built
    edge list at smoke scale."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spark_hive_spark.operators.graph import BFS_HUB, BFS_TOP_LANES
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    li = t(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, SF_SMOKE, "supplier").select("s_suppkey", "s_nationkey")
    dirw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("src").orderBy(F.desc("w"), "dst")),
        )
        .filter(F.col("rn") <= BFS_TOP_LANES)
        .select("src", "dst")
        .collect()
    )
    adj = {}
    for r in dirw:
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    nation = {
        r.n_name: r.n_nationkey
        for r in t(spark, SF_SMOKE, "nation").collect()
    }
    hops = {
        nation[r.n_name]: r.hops
        for r in all_queries()["graph_bfs_trade_hops"].fn(spark, SF_SMOKE).collect()
    }
    hub = nation[BFS_HUB]
    assert hops[hub] == 0
    for node, d in hops.items():
        if d > 0:
            assert any(hops.get(nb, -1) == d - 1 for nb in adj.get(node, ())), (
                node,
                d,
            )
        if d >= 0:
            for nb in adj.get(node, ()):
                if hops.get(nb, -1) >= 0:
                    assert hops[nb] <= d + 1, (node, nb)
    # unreached (-1) nodes must have no reached neighbor
    for node, d in hops.items():
        if d == -1:
            assert all(hops.get(nb, -1) == -1 for nb in adj.get(node, ())), node


def test_ppjoin_matches_python_bruteforce(spark):
    """PPJoin completeness re-proof, blind: recompute the exact
    same-lang Jaccard join by literal O(n²) set intersection in
    Python at smoke scale and demand identical ventile buckets,
    pair counts, and checksums."""
    import re
    from collections import defaultdict
    from itertools import combinations

    from spark_hive_spark.operators.setsim import T_DEN, T_NUM
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    docs = t(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    toksets = {}
    for r in docs:
        norm = re.sub(r"\s+", " ", r.text.strip().lower())
        toks = {w for w in norm.split(" ") if w}
        if toks:
            toksets[r.doc_id] = (r.lang, toks)
    agg = defaultdict(lambda: [0, 0, 0])
    for (d1, (l1, s1)), (d2, (l2, s2)) in combinations(
        sorted(toksets.items()), 2
    ):
        if l1 != l2:
            continue
        inter = len(s1 & s2)
        union = len(s1) + len(s2) - inter
        if T_DEN * inter >= T_NUM * union:
            b = (20 * inter) // union
            agg[b][0] += 1
            agg[b][1] += inter
            agg[b][2] += d1 * 1000003 + d2
    rows = (
        all_queries()["setsim_ppjoin_prefix_filter"].fn(spark, SF_SMOKE).collect()
    )
    got = {
        r.jaccard_ventile: [r.n_pairs, r.sum_common, r.pair_checksum]
        for r in rows
    }
    assert got == dict(agg)


def test_hard_negatives_exact_vs_numpy(spark):
    """The distributed per-task top-k refinement must equal a literal
    numpy all-pairs computation at smoke scale: same neighbor ids,
    same order, labels always differ."""
    import numpy as np

    from spark_hive_spark.operators.mining import HN_TOP_K
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    rows = t(spark, SF_SMOKE, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    labs = np.array([r.label for r in rows])
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(X @ X.T, 6)
    expected = {}
    for i in range(len(ids)):
        mask = labs != labs[i]
        sims, nids = S[i, mask], ids[mask]
        order = np.lexsort((nids, -sims))[:HN_TOP_K]
        expected[ids[i]] = list(zip(nids[order], sims[order]))
    got = {}
    for r in (
        all_queries()["mining_hard_negatives"].fn(spark, SF_SMOKE).collect()
    ):
        got.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.cos_sim, r.neg_label)
        )
        assert r.neg_label != labs[ids == r.query_id][0]
    assert set(got) == set(expected)
    for qid, exp in expected.items():
        assert [(n, s) for n, s, _ in got[qid]] == [
            (int(n), float(s)) for n, s in exp
        ], qid


def test_mannwhitney_matches_python_reference(spark):
    """U and z recomputed by a literal Python implementation
    (average ranks, tie-corrected variance) at smoke scale."""
    from collections import Counter

    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    rows = (
        t(spark, SF_SMOKE, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_acctbal").isNotNull()
        )
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    pool = [(r.c_mktsegment, round(r.c_acctbal, 2)) for r in rows]
    vals = sorted(v for _, v in pool)
    first_rank = {}
    for i, v in enumerate(vals, start=1):
        first_rank.setdefault(v, i)
    cnt = Counter(vals)
    avg_rank = {v: first_rank[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    n1 = sum(1 for s, _ in pool if s == "BUILDING")
    n2 = len(pool) - n1
    r1 = sum(avg_rank[v] for s, v in pool if s == "BUILDING")
    u = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    tie_sum = sum(t_**3 - t_ for t_ in cnt.values())
    sigma = (
        n1 * n2 / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    ) ** 0.5
    z = (u - n1 * n2 / 2.0) / sigma
    got = all_queries()["mannwhitney_u_segments"].fn(spark, SF_SMOKE).collect()[0]
    assert got.n_building == n1 and got.n_machinery == n2
    assert abs(got.u_stat - u) < 0.01
    assert abs(got.z_approx - z) < 1e-5


def test_kaplan_meier_matches_python(spark):
    """K-M curve recomputed by the textbook product formula in
    Python at smoke scale: identical steps, monotone non-increasing
    survival in (0, 1]."""
    from collections import Counter
    from datetime import timedelta

    from spark_hive_spark.operators.statistics import KM_CENSOR_DAYS
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    rows = (
        t(spark, SF_SMOKE, "orders")
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .collect()
    )
    by_cust = {}
    for r in rows:
        lo, hi = by_cust.get(r.o_custkey, (r.d, r.d))
        by_cust[r.o_custkey] = (min(lo, r.d), max(hi, r.d))
    end_d = max(hi for _, hi in by_cust.values())
    subj = [
        (
            (hi - lo).days,
            1 if hi < end_d - timedelta(days=KM_CENSOR_DAYS) else 0,
        )
        for lo, hi in by_cust.values()
    ]
    cnt_all = Counter(lt for lt, _ in subj)
    d_ev = Counter(lt for lt, e in subj if e)
    total = len(subj)
    s, prior, expected = 1.0, 0, {}
    for lt in sorted(cnt_all):
        n_risk = total - prior
        d = d_ev.get(lt, 0)
        s *= 1.0 - d / n_risk
        if d > 0:
            expected[lt] = (n_risk, d, s)
        prior += cnt_all[lt]
    got = {
        r.lifetime_days: (r.n_at_risk, r.n_events, r.survival)
        for r in all_queries()["kaplan_meier_customer_lifetime"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(expected)
    prev = 1.0
    for lt in sorted(got):
        n_risk, d, s_py = expected[lt]
        g_risk, g_d, g_s = got[lt]
        assert (g_risk, g_d) == (n_risk, d)
        assert abs(g_s - s_py) < 1e-5
        assert 0.0 < g_s <= prev + 1e-12
        prev = g_s


def test_mannkendall_matches_python(spark):
    """S, tie-corrected z, and the Theil-Sen median slope recomputed
    literally in Python at smoke scale."""
    import statistics as pystats
    from collections import Counter

    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    monthly = (
        t(spark, SF_SMOKE, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
        .orderBy("m")
        .collect()
    )
    xs = [float(r.x) for r in monthly]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    slopes = [
        (xs[j] - xs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    ]
    tsum = sum(
        t_ * (t_ - 1) * (2 * t_ + 5)
        for t_ in Counter(xs).values()
        if t_ > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    z = (s - cc) / var**0.5
    got = (
        all_queries()["mannkendall_theilsen_trend"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert got.n_months == n and got.s_stat == s
    assert got.n_pairs == n * (n - 1) // 2
    assert abs(got.z_mk - z) < 1e-5
    assert abs(got.theil_sen_slope - pystats.median(slopes)) < 0.02


def test_conformal_marginal_coverage_near_target(spark):
    """Split-conformal guarantee: MARGINAL test coverage must sit near
    0.9 (finite-sample slack scales as 1/n_cal) and qhat is a real
    calibration residual (positive, shared by all rows)."""
    from spark_hive_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["conformal_price_intervals"].fn(spark, SF_SMOKE).collect()
    assert rows
    q = rows[0].qhat
    assert q > 0 and all(r.qhat == q for r in rows)
    n = sum(r.n_test for r in rows)
    cov = sum(r.n_covered for r in rows) / n
    # marginal guarantee: >= 0.9 - slack; upper side loose
    assert cov >= 0.9 - 3.0 / (n**0.5), (cov, n)
    assert cov <= 1.0


def test_geo_radius_fixture_boundary_margins():
    """The banded radius join rounds haversine to 1 dp and compares
    against the 500 km threshold and 50 km band floors. Those are
    float operations on libm trig output, so the hash is stable ONLY
    if no fixture pair sits within float noise of (a) a .05 rounding
    boundary or (b) the 500.05 threshold / a band edge after
    rounding. This audit computes every same-3x3-cell candidate pair
    at the two oracle scales in numpy and pins both margins >= 1e-6
    — five orders of magnitude above cross-engine libm ULP drift."""
    import numpy as np
    import pyarrow.parquet as pq

    from spark_hive_spark.operators.spatial import (
        CELL_LAT_DEG,
        CELL_LON_DEG,
        GEO_RADIUS_KM,
    )

    for sf in ("sf0.001", "sf0.01"):
        keys = pq.read_table(
            f"/root/testdata/{sf}/customer.parquet", columns=["c_custkey"]
        )["c_custkey"].to_numpy()
        lat = (keys * 37 % 12001) / 100.0 - 60
        lon = (keys * 73 % 34001) / 100.0 - 170
        cla = np.floor(lat / CELL_LAT_DEG)
        clo = np.floor(lon / CELL_LON_DEG)
        # candidate mask: within one cell on both axes (the join's
        # 3x3 neighborhood), upper triangle
        dla = np.abs(cla[:, None] - cla[None, :]) <= 1
        dlo = np.abs(clo[:, None] - clo[None, :]) <= 1
        iu = np.triu(np.ones((len(keys), len(keys)), dtype=bool), k=1)
        m = dla & dlo & iu
        i, j = np.where(m)
        p1, l1 = np.radians(lat[i]), np.radians(lon[i])
        p2, l2 = np.radians(lat[j]), np.radians(lon[j])
        d = (
            2
            * 6371.0
            * np.arcsin(
                np.sqrt(
                    np.sin((p2 - p1) / 2) ** 2
                    + np.cos(p1) * np.cos(p2) * np.sin((l2 - l1) / 2) ** 2
                )
            )
        )
        # (a) distance from the nearest .05 rounding boundary
        frac = np.abs(((d * 10) % 1) - 0.5) / 10
        assert frac.min() >= 1e-6, f"{sf}: rounding-boundary margin"
        dr = np.round(d, 1)
        # (b) rounded values never land ON the threshold or a band
        # edge (where engines could disagree about <= / floor)
        assert not np.any(
            np.abs(dr - GEO_RADIUS_KM) < 1e-9
        ), f"{sf}: rounded distance ON the threshold"
        near = dr[np.abs(dr - GEO_RADIUS_KM) < 0.05 - 1e-9]
        assert near.size == 0 or np.all(
            np.abs(near - GEO_RADIUS_KM) > 1e-9
        ), f"{sf}: threshold collision"
        kept = dr[dr <= GEO_RADIUS_KM]
        on_edge = kept[np.abs((kept % 50)) < 1e-9]
        # exact multiples of 50 are fine ONLY if they are exact in
        # both engines: dr is a 1-dp decimal, so x.0 multiples of 50
        # are exactly representable and floor() agrees — assert the
        # remaining fractional band positions keep a margin
        offgrid = kept[np.abs((kept % 50)) >= 1e-9]
        assert np.all((offgrid % 50) > 1e-6), f"{sf}: band-edge margin"


def test_block_topk_matches_lexsort_reference():
    """`mining._block_topk` (the vectorized per-task top-k both
    miners share) must reproduce the per-row lexsort reference
    EXACTLY under the (round(sim,6) desc, id asc) total order,
    including heavy rounded-similarity ties and self-exclusion —
    the int64 composite key has no float tie-break hazards, and a
    regression here silently corrupts both miners' hashes."""
    import numpy as np
    import pandas as pd

    from spark_hive_spark.operators.mining import _block_topk

    for trial in range(20):
        rng = np.random.default_rng(trial)
        n, m, k = int(rng.integers(1, 80)), int(rng.integers(1, 60)), 3
        if trial % 2:
            S = np.round(rng.uniform(-1, 1, size=(n, m)), 6)
        else:  # heavy ties at identical rounded values
            S = np.round(
                rng.choice([0.1, 0.2, 0.3, -0.1], size=(n, m)), 6
            )
        qids = rng.permutation(np.arange(1000, 1000 + n)).astype(np.int64)
        qlab = rng.integers(0, 3, n)
        clab = rng.integers(0, 3, m)
        for excl in (False, True):
            if excl and m <= n:
                cids = qids[:m].copy()  # force real self-collisions
            else:
                cids = rng.permutation(np.arange(m)).astype(np.int64)
            new = _block_topk(S, qids, qlab, cids, clab, k, exclude_self=excl)
            rows = []
            for i in range(n):
                mask = clab != qlab[i]
                if excl:
                    mask &= cids != qids[i]
                if not mask.any():
                    continue
                sims, ids, labs = S[i, mask], cids[mask], clab[mask]
                order = np.lexsort((ids, -sims))[:k]
                for o in order:
                    rows.append((qids[i], ids[o], labs[o], sims[o]))
            ref = pd.DataFrame(
                rows,
                columns=["query_id", "neighbor_id", "neg_label", "cos_sim"],
            )
            assert len(new) == len(ref), (trial, excl)
            if len(ref):
                assert (
                    new.reset_index(drop=True).values == ref.values
                ).all(), (trial, excl)


def test_webp_lossless_roundtrip_exact():
    """VP8L is LOSSLESS: encode_webp_lossless -> decode_webp must be
    bit-exact on arbitrary images — random RGB (literal-heavy, full
    ~256-symbol normal prefix codes), tile images (backref runs +
    simple codes), a constant frame (one maximal LZ77 run chain), and
    a single pixel (degenerate dims). Any prefix-code construction,
    bit-order, or backward-reference bug corrupts pixels exactly."""
    import numpy as np

    from spark_hive_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(911)
    for shape in [(26, 17, 3), (5, 19, 3), (1, 1, 3), (40, 1, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(img, decode_webp(encode_webp_lossless(img)))
    tiles = rng.randint(0, 256, (3, 5, 3))
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1).astype(np.uint8)
    assert np.array_equal(img, decode_webp(encode_webp_lossless(img)))
    img = np.full((64, 64, 3), 200, np.uint8)
    blob = encode_webp_lossless(img)
    assert np.array_equal(img, decode_webp(blob))
    # the constant frame must actually compress via backrefs (not 4k
    # literals): container + codes + a handful of run tokens
    assert len(blob) < 200
    # container structure
    assert blob[:4] == b"RIFF" and blob[8:16] == b"WEBPVP8L"


def test_webp_decode_rejections():
    """decode_webp fails loudly on everything outside the implemented
    profile: non-WebP bytes, lossy VP8/VP8X chunks, truncated chunks,
    and structurally invalid streams — partial support would silently
    corrupt pixels. (Predictor transforms, color cache, and 2D
    distance codes are implemented as of round 10 — see
    test_webp_predictor_cache_roundtrip.)"""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    with pytest.raises(ValueError):
        decode_webp(b"JFIF not webp at all....")
    img = np.full((8, 8, 3), 7, np.uint8)
    good = encode_webp_lossless(img)
    with pytest.raises(NotImplementedError):
        decode_webp(good[:12] + b"VP8 " + good[16:])
    with pytest.raises(ValueError):
        decode_webp(good[: len(good) // 2])  # truncated chunk
    # flip the first post-header flag bit (transforms-present): the
    # VP8L header is 1 signature byte + 14+14+1+3 = 32 bits, so the
    # transform bit is bit 0 of payload byte 5 (offset 20+1+4).
    # The stream that follows is not a valid transform payload ->
    # loud structural error, never a half-parsed frame
    patched = bytearray(good)
    patched[25] |= 0x01
    with pytest.raises((NotImplementedError, ValueError)):
        decode_webp(bytes(patched))


def test_webp_predictor_cache_roundtrip():
    """Round-10 VP8L additions (VERDICT r9 task 5): the 14-mode
    predictor transform, the color cache, and the 2D distance
    neighborhood map must all round-trip EXACTLY (the format is
    lossless) — alone and composed. The encoder's per-block mode
    schedule (bx+by mod 14) guarantees every predictor mode is
    exercised on images with >= 14 blocks, including the Select and
    ClampAddSubtractHalf C-semantics corners; gradients make
    non-trivial residuals, tiles make backref runs that must keep
    the cache state machine in sync on COPIED pixels too."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(614)
    x = np.arange(40)[None, :]
    y = np.arange(24)[:, None]
    gradient = np.stack(
        [(3 * x + 5 * y) % 256, (7 * x + y) % 256, (x + 11 * y) % 256],
        axis=2,
    ).astype(np.uint8)
    v = (13 + 19 * np.arange(4)[None, :] + 31 * np.arange(3)[:, None]) % 256
    tiles = np.repeat(
        np.repeat(
            np.stack([v, (v + 85) % 256, (v + 170) % 256], axis=2), 8, 0
        ),
        8,
        1,
    ).astype(np.uint8)
    images = [
        gradient,
        tiles,
        rng.randint(0, 256, (13, 21, 3)).astype(np.uint8),
        rng.randint(0, 256, (1, 1, 3)).astype(np.uint8),
    ]
    for img in images:
        for kw in (
            {"transform": "predictor"},
            {"color_cache_bits": 4},
            {"dist_2d": True},
            {"transform": "predictor", "color_cache_bits": 8,
             "dist_2d": True},
            {"transform": "color"},
            {"transform": "color", "color_cache_bits": 5,
             "meta_prefix_bits": 2},
            {"meta_prefix_bits": 3},
            {"transform": "predictor", "meta_prefix_bits": 2,
             "color_cache_bits": 4, "dist_2d": True},
        ):
            got = decode_webp(encode_webp_lossless(img, **kw))
            assert np.array_equal(got, img), (img.shape, kw)
    # alpha: (H, W, 4) round-trips through every transform with the
    # return_alpha opt-in; without it, transparency stays loud; RGB
    # input keeps returning (H, W, 3) even when the caller opts in
    rgba = rng.randint(0, 256, (13, 21, 4)).astype(np.uint8)
    for kw in (
        {},
        {"transform": "subtract_green"},
        {"transform": "predictor", "color_cache_bits": 5},
        {"transform": "color", "meta_prefix_bits": 2},
    ):
        got = decode_webp(
            encode_webp_lossless(rgba, **kw), return_alpha=True
        )
        assert np.array_equal(got, rgba), kw
    with pytest.raises(NotImplementedError):
        decode_webp(encode_webp_lossless(rgba))
    rgb = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    out3 = decode_webp(encode_webp_lossless(rgb), return_alpha=True)
    assert out3.shape == (8, 8, 3) and np.array_equal(out3, rgb)
    apal = np.concatenate(
        [rng.randint(0, 256, (5, 3)), rng.randint(0, 255, (5, 1))], axis=1
    )
    aimg = apal[rng.randint(0, 5, (11, 19))].astype(np.uint8)
    assert np.array_equal(
        decode_webp(
            encode_webp_lossless(aimg, transform="palette_bundled"),
            return_alpha=True,
        ),
        aimg,
    )
    # pixel bundling: <= 16 colors pack 2/4/8 indices per green byte
    # and shrink the coded width — every density, odd widths, and
    # composition with meta groups must unbundle exactly
    for ncol, shape in [(2, (9, 17)), (4, (11, 23)), (16, (13, 29))]:
        pal = rng.randint(0, 256, (ncol, 3))
        img = pal[rng.randint(0, ncol, shape)].astype(np.uint8)
        for kw in (
            {},
            {"dist_2d": True},
            {"meta_prefix_bits": 2, "color_cache_bits": 4},
        ):
            got = decode_webp(
                encode_webp_lossless(
                    img, transform="palette_bundled", **kw
                )
            )
            assert np.array_equal(got, img), (ncol, shape, kw)
    # invalid cache sizes stay loud in both directions
    with pytest.raises(ValueError):
        encode_webp_lossless(gradient, color_cache_bits=12)
    blob = bytearray(encode_webp_lossless(gradient, color_cache_bits=4))
    # byte 25 = first post-header byte (LSB-first): bit 0 transform
    # flag (0), bit 1 cache flag (1), bits 2-5 cache_bits = 4.
    # Patch cache_bits to 15 -> invalid (spec max 11)
    blob[25] = (blob[25] & 0xC3) | (15 << 2)
    with pytest.raises(ValueError):
        decode_webp(bytes(blob))


def test_webp_decode_image_dispatch():
    """decode_image routes RIFF/WEBP payloads to the VP8L decoder and
    returns the standard (H, W, 3) RGB contract."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import decode_image
    from spark_hive_spark.operators.webp import encode_webp_lossless

    img = np.arange(8 * 16 * 3, dtype=np.uint8).reshape(8, 16, 3)
    out = decode_image(encode_webp_lossless(img))
    assert out.shape == (8, 16, 3)
    assert np.array_equal(out, img)


def test_gif_codec_roundtrip_and_rejections():
    """GIF round-trips exactly over its palette (lossless): raw LZW
    at every min-code-size including 12-bit width growth, dictionary
    reset at 4096, and KwKwK chains; whole files across palette
    sizes 2/16/256, the 4-pass interlace (including 1-row frames
    where most passes are empty), transparency (RGBA out, alpha 0 at
    the declared index), and multi-frame animations (first frame +
    count + total delay). Structural garbage fails loudly, and
    decode_image keeps its RGB contract (transparent GIFs point at
    decode_gif)."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.gif import (
        _lzw_compress,
        _lzw_decompress,
        decode_gif,
        encode_gif,
    )
    from spark_hive_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(87)
    for mcs in (2, 4, 8):
        data = rng.randint(0, 1 << mcs, 20000)
        assert np.array_equal(
            _lzw_decompress(_lzw_compress(data, mcs), mcs, len(data)),
            data,
        ), mcs
    runs = np.repeat(np.arange(4), 5000)  # KwKwK + deep chains
    assert np.array_equal(
        _lzw_decompress(_lzw_compress(runs, 2), 2, len(runs)), runs
    )
    # final-code width-boundary regression (round 10): the decoder
    # appends a dictionary entry for the LAST data code too — when
    # that append lands exactly on a 2^width boundary, EOI must be
    # written one bit wider. Sweep every prefix across the first two
    # boundaries so the crossing is hit at the stream end.
    data = rng.randint(0, 16, 900)
    for n in range(1, 900, 7):
        pre = data[:n]
        assert np.array_equal(
            _lzw_decompress(_lzw_compress(pre, 4), 4, n), pre
        ), n

    pal = np.stack(
        [np.arange(256), (np.arange(256) * 7) % 256,
         (np.arange(256) * 13) % 256],
        axis=1,
    )
    for ncol, shape in [(2, (7, 9)), (16, (20, 33)), (256, (40, 50))]:
        img = pal[rng.randint(0, ncol, shape)].astype(np.uint8)
        for interlace in (False, True):
            frame, n, _ = decode_gif(encode_gif(img, interlace=interlace))
            assert n == 1 and np.array_equal(frame, img), (ncol, interlace)
    img = pal[rng.randint(0, 16, (12, 19))].astype(np.uint8)
    frames = [img, np.roll(img, 1, axis=1), np.roll(img, 3, axis=0)]
    first, n, delay = decode_gif(encode_gif(frames, delay_cs=7))
    assert (n, delay) == (3, 21) and np.array_equal(first, img)
    tfirst, _, _ = decode_gif(
        encode_gif(img, transparent_color=tuple(int(v) for v in pal[0]))
    )
    assert tfirst.shape[2] == 4
    assert np.array_equal(tfirst[:, :, :3], img)
    assert np.array_equal(
        tfirst[:, :, 3] == 0, (img == pal[0]).all(axis=2)
    )
    with pytest.raises(NotImplementedError):
        decode_image(
            encode_gif(img, transparent_color=tuple(int(v) for v in pal[0]))
        )
    assert np.array_equal(decode_image(encode_gif(img)), img)
    with pytest.raises(ValueError):
        decode_gif(b"PNG not a gif....")
    blob = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])  # truncated mid-stream
    with pytest.raises(ValueError):
        decode_gif(blob[:6] + b"\x00" * 7 + blob[13:])  # zeroed screen


def test_tiff_codec_roundtrip_and_rejections():
    """Baseline TIFF round-trips exactly (lossless): both byte
    orders x {uncompressed, TIFF-LZW, LZW+predictor-2, PackBits} x
    {gray, RGB}, multi-strip layouts, and the LZW EARLY-CHANGE width
    rule swept across the 511/1023 boundaries prefix-by-prefix (the
    one-behind decoder widens at table size 2^w - 2 — an off-by-one
    here decodes garbage past code 510). Structural garbage and
    unsupported shapes fail loudly."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.tiff import (
        _packbits_decode,
        _packbits_encode,
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(259)
    big = bytes(rng.randint(0, 256, 60000).astype(np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(big), len(big)) == big
    data = bytes(rng.randint(0, 256, 1200).astype(np.uint8))
    for n in range(1, 1200, 7):  # early-change boundary sweep
        pre = data[:n]
        assert _tiff_lzw_decode(_tiff_lzw_encode(pre), n) == pre, n
    runs = bytes(np.repeat(np.arange(4, dtype=np.uint8), 8000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs), len(runs)) == runs
    row = bytes(rng.randint(0, 4, 997).astype(np.uint8))
    assert _packbits_decode(_packbits_encode(row), len(row)) == row

    g = rng.randint(0, 256, (23, 37)).astype(np.uint8)
    c = rng.randint(0, 256, (23, 37, 3)).astype(np.uint8)
    for be in (False, True):
        for comp, pred in [(1, False), (5, False), (5, True),
                           (32773, False)]:
            for img in (g, c):
                got = decode_tiff(
                    encode_tiff(
                        img, big_endian=be, compression=comp,
                        predictor=pred, rows_per_strip=5,
                    )
                )
                assert np.array_equal(got, img), (be, comp, pred)
    with pytest.raises(ValueError):
        decode_tiff(b"GIF8 not a tiff")
    blob = encode_tiff(c, compression=5)
    with pytest.raises(ValueError):
        decode_tiff(blob[: len(blob) // 2])
    # unsupported compression scheme id -> loud
    import struct as _struct

    patched = bytearray(blob)
    # find the compression tag (259) in the IFD and set value to 6
    (n_entries,) = _struct.unpack_from("<H", patched, 8)
    for i in range(n_entries):
        base = 10 + 12 * i
        tag, = _struct.unpack_from("<H", patched, base)
        if tag == 259:
            _struct.pack_into("<H", patched, base + 8, 6)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(patched))


def test_flac_codec_roundtrip_and_rejections():
    """FLAC round-trips exactly (lossless): mono/stereo x all four
    channel assignments x fixed/LPC predictors x partition orders,
    across frame boundaries with odd tails, int16 extremes, constant
    and tiny blocks. The stream is REAL: CRC-8 header and CRC-16
    frame checks verify on decode (and corrupting a byte fails
    loudly), and smooth signals genuinely compress below raw PCM
    (the predictors+Rice do real work, not a verbatim wrapper)."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.RandomState(9639)
    mono = rng.randint(-32768, 32768, 3000).astype(np.int64)
    t = np.arange(5000)
    smooth = (10000 * np.sin(t / 50) + 300 * np.sin(t / 7)).astype(
        np.int64
    )

    def rt(x, **kw):
        rate, got = decode_flac(encode_flac(x, **kw))
        assert rate == kw.get("rate", 44100)
        assert np.array_equal(got, np.asarray(x, dtype=np.int64)), kw

    rt(mono)
    rt(mono, block_size=256, partition_order=3)
    rt(mono, lpc_order=4)
    rt(smooth, block_size=512, lpc_order=8)
    rt(np.full(1000, -123, dtype=np.int64), block_size=256)
    rt(np.array([5, -3, 7], dtype=np.int64))
    rt(np.array([32767, -32768] * 100, dtype=np.int64), block_size=64)
    rt(mono[:2503], block_size=256)  # short final frame
    st = np.stack(
        [smooth[:3000], smooth[:3000] // 2 + mono[:3000] // 8], axis=1
    )
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        rt(st, stereo_mode=mode, block_size=256, partition_order=2)
        rt(st, stereo_mode=mode, block_size=256, lpc_order=4)
    # compression is real
    blob = encode_flac(smooth, block_size=512, lpc_order=8)
    assert len(blob) < len(smooth) * 2 * 0.6
    # integrity: flip one payload byte -> a CRC must catch it
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(b"RIFF not flac")
    with pytest.raises(ValueError):
        decode_flac(blob[: len(blob) // 2])


def test_media_container_parsers():
    """ISO-BMFF and MP3-frame container parsing — the undecoded-media
    metadata layer. MP4: the box walker must recover movie/track
    timescales, durations, sample counts, byte totals, and keyframe
    positions from real stts/stsz/stss tables (fixed-size stsz form
    included), and fail loudly on truncation and bad box sizes. MP3:
    the frame walk must hop exact 144*bitrate/rate+padding lengths
    across mixed-bitrate streams — one mis-sized frame loses sync
    loudly — and reject free/bad bitrates and non-MPEG1-LayerIII
    headers."""
    import pytest

    from spark_hive_spark.operators.media_containers import (
        encode_mp3_frames,
        encode_mp4,
        parse_mp4,
        scan_mp3_frames,
    )

    video = {
        "kind": "vide", "track_timescale": 12800,
        "sample_deltas": [512] * 25,
        "sample_sizes": [1000 + i for i in range(25)],
        "keyframes": [1, 13, 25],
    }
    audio = {
        "kind": "soun", "track_timescale": 44100,
        "sample_deltas": [1024] * 10,
        "sample_sizes": [128] * 10,
    }
    meta = parse_mp4(encode_mp4([video, audio]))
    assert meta["timescale"] == 1000
    assert meta["duration"] == 25 * 512 * 1000 // 12800
    kinds = {tr["kind"]: tr for tr in meta["tracks"]}
    assert kinds["vide"]["n_samples"] == 25
    assert kinds["vide"]["total_bytes"] == sum(video["sample_sizes"])
    assert kinds["vide"]["keyframes"] == 3
    assert kinds["vide"]["min_size"] == 1000
    assert kinds["vide"]["max_size"] == 1024
    assert kinds["soun"]["n_samples"] == 10
    assert kinds["soun"]["duration"] == 10 * 1024
    blob = encode_mp4([video])
    with pytest.raises(ValueError):
        parse_mp4(blob[:-3])  # truncated
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x03bad")  # size < 8

    specs = [(9, 0, 0), (11, 0, 1), (14, 1, 0), (9, 2, 0)]
    stream = encode_mp3_frames(specs)
    meta = scan_mp3_frames(stream)
    assert meta["frames"] == 4
    assert meta["bytes"] == len(stream)
    assert (meta["min_kbps"], meta["max_kbps"]) == (128, 320)
    with pytest.raises(ValueError):
        scan_mp3_frames(stream[:-5])  # truncated final frame
    with pytest.raises(ValueError):
        scan_mp3_frames(b"\x12\x34\x56\x78")  # no sync
    with pytest.raises(ValueError):
        scan_mp3_frames(b"\xff\xfb\x00\x00")  # free bitrate


def test_jpeg_12bit_precision():
    """12-bit extended-sequential JPEG (SOF1): uint16 samples in
    0..4095 round-trip through the x16-scaled quantizer with the
    closed form clip(32*signround((v-2048)/32)+2048) on
    block-constant images (including under restart markers and
    non-multiple-of-8 dims), noise decodes within the quantizer's
    error envelope at uint16 dtype, decode_image scales to the
    8-bit RGB contract, and the illegal shapes fail loudly (12-bit
    color, 12-bit relabeled as baseline SOF0)."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(4095)
    v = (7 * 97 + 131 * np.arange(4)[None, :]
         + 211 * np.arange(3)[:, None]) % 4096
    img = np.repeat(np.repeat(v, 8, 0), 8, 1).astype(np.uint16)
    s = v.astype(np.int64) - 2048
    sr = np.sign(s) * ((np.abs(s) + 16) // 32)
    exp = np.repeat(np.repeat(np.clip(32 * sr + 2048, 0, 4095), 8, 0), 8, 1)
    for kw in ({}, {"restart_interval": 3}):
        got = decode_jpeg(encode_jpeg(img, precision=12, **kw))
        assert got.dtype == np.uint16
        assert np.array_equal(got.astype(np.int64), exp), kw
    crop = img[:19, :29]
    assert decode_jpeg(encode_jpeg(crop, precision=12)).shape == (19, 29)
    noise = rng.randint(0, 4096, (16, 24)).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(noise, precision=12))
    assert out.dtype == np.uint16 and out.max() <= 4095
    disp = decode_image(encode_jpeg(img, precision=12))
    assert disp.dtype == np.uint8 and disp.shape == (*img.shape, 3)
    assert np.array_equal(disp[:, :, 0].astype(np.int64), exp >> 4)
    with pytest.raises(ValueError):
        encode_jpeg(rng.randint(0, 256, (8, 8, 3)).astype(np.uint8),
                    precision=12)
    with pytest.raises(ValueError):
        encode_jpeg(np.full((8, 8), 5000, dtype=np.uint16), precision=12)
    blob = encode_jpeg(img, precision=12)
    with pytest.raises(ValueError):  # 12-bit relabeled baseline SOF0
        decode_jpeg(blob.replace(b"\xff\xc1", b"\xff\xc0", 1))


def test_pnm_codec_roundtrip():
    """netpbm (P1-P6) round-trips exactly: ASCII and binary variants,
    packed-bit P4 rows (byte-aligned, MSB first, non-multiple-of-8
    widths), one- and two-byte binary samples by maxval, and header
    comments the tokenizer must skip. decode_image maps bitmaps via
    the PBM 1-is-black convention and scales 16-bit to the high
    byte."""
    import numpy as np
    import pytest

    from spark_hive_spark.operators.multimodal import (
        decode_image,
        decode_pnm,
        encode_pnm,
    )

    rng = np.random.RandomState(246)
    bits = rng.randint(0, 2, (13, 21)).astype(np.uint8)
    g8 = rng.randint(0, 256, (9, 17)).astype(np.uint8)
    g16 = rng.randint(0, 65536, (9, 17)).astype(np.uint16)
    c8 = rng.randint(0, 256, (7, 5, 3)).astype(np.uint8)
    c16 = rng.randint(0, 65536, (7, 5, 3)).astype(np.uint16)
    cases = [
        (bits, "P1"), (bits, "P4"), (g8, "P2"), (g8, "P5"),
        (g16, "P5"), (c8, "P3"), (c8, "P6"), (c16, "P6"),
        (rng.randint(0, 2, (3, 17)).astype(np.uint8), "P4"),
    ]
    for img, fmt in cases:
        for comment in (None, "a # tricky comment"):
            got = decode_pnm(encode_pnm(img, fmt, comment=comment))
            assert got.shape == img.shape and np.array_equal(got, img), (
                fmt, comment,
            )
    disp = decode_image(encode_pnm(bits, "P4"))
    assert disp.shape == (*bits.shape, 3)
    assert np.array_equal(
        disp[:, :, 0], ((1 - bits.astype(np.int64)) * 255).astype(np.uint8)
    )
    disp16 = decode_image(encode_pnm(g16, "P5"))
    assert np.array_equal(disp16[:, :, 0], (g16 >> 8).astype(np.uint8))
    with pytest.raises(ValueError):
        decode_pnm(b"P7 not supported")
    with pytest.raises(ValueError):
        decode_pnm(encode_pnm(g8, "P5")[:-9])  # truncated samples


def test_warc_reader():
    """WARC framing round-trips in both layouts: plain concatenated
    records and the splittable .warc.gz (one gzip member per record,
    walked via zlib unused_data). The reader surfaces record types,
    HTTP status codes, and body/content lengths; framing damage —
    truncated bodies, missing terminating CRLFs, garbage between
    gzip members — fails loudly."""
    import pytest

    from spark_hive_spark.operators.warc import encode_warc, parse_warc

    recs = [
        {"type": "warcinfo", "payload": b"software: test\r\n"},
        {"type": "request", "uri": "http://x/1",
         "payload": b"GET /1 HTTP/1.1\r\nHost: x\r\n\r\n"},
        {"type": "response", "uri": "http://x/1",
         "payload": b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello"},
        {"type": "response", "uri": "http://x/2",
         "payload": b"HTTP/1.1 404 NF\r\n\r\n"},
        {"type": "metadata", "payload": b"done\r\n"},
    ]
    for gz in (False, True):
        out = parse_warc(encode_warc(recs, gzip_per_record=gz))
        assert [r["type"] for r in out] == [
            "warcinfo", "request", "response", "response", "metadata",
        ]
        resp = [r for r in out if r["type"] == "response"]
        assert [r["status"] for r in resp] == [200, 404]
        assert resp[0]["content_len"] == 5
        assert resp[0]["uri"] == "http://x/1"
    plain = encode_warc(recs)
    with pytest.raises(ValueError):
        parse_warc(plain[:-6])  # terminating CRLFs gone
    gzed = encode_warc(recs, gzip_per_record=True)
    with pytest.raises(ValueError):
        parse_warc(gzed[: len(gzed) - 8])  # truncated member
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC AT ALL\r\n\r\n")


def test_webdataset_tar_reader():
    """ustar framing round-trips: space-seeded header checksums,
    octal size fields, 512-byte block padding, the two-zero-block
    terminator; WebDataset grouping joins ADJACENT members sharing
    the basename key and rejects a key that reappears after a gap
    (streaming loaders cannot regroup across one). Cross-check
    against stdlib tarfile: our encoder's output must be readable by
    the real tool, and real tarfile output must parse back."""
    import io
    import tarfile

    import pytest

    from spark_hive_spark.operators.webdataset import (
        encode_tar,
        group_samples,
        parse_tar,
    )

    members = [
        ("00001.cls", b"7"),
        ("00001.txt", b"a caption"),
        ("00001.bin", bytes(range(200)) * 3),  # 600 B: 2 data blocks
        ("00002.cls", b"3"),
        ("00002.txt", b"another"),
    ]
    blob = encode_tar(members)
    assert parse_tar(blob) == members
    assert len(blob) % 512 == 0

    # our output is real ustar: stdlib tarfile reads it back
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert [m.name for m in tf.getmembers()] == [n for n, _ in members]
        assert tf.extractfile("00001.bin").read() == members[2][1]

    # real tarfile output parses back through our reader
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    assert [(n, d) for n, d in parse_tar(buf.getvalue())] == members

    groups = group_samples(members)
    assert [k for k, _ in groups] == ["00001", "00002"]
    assert set(groups[0][1]) == {"cls", "txt", "bin"}

    # framing damage fails loudly
    with pytest.raises(ValueError):
        parse_tar(blob[:-512])  # one terminator block missing
    with pytest.raises(ValueError):
        parse_tar(blob[: 512 + 100])  # truncated member data
    corrupt = bytearray(blob)
    corrupt[130] ^= 1  # flip a size digit -> checksum mismatch
    with pytest.raises(ValueError):
        parse_tar(bytes(corrupt))
    with pytest.raises(ValueError):
        group_samples([("a.cls", b"1"), ("b.cls", b"2"), ("a.txt", b"x")])
    with pytest.raises(ValueError):
        group_samples([("noext", b"")])


def test_bpe_encode_matches_gpt2_reference():
    """The replace-chain BPE encode equals the GPT-2 reference
    algorithm (repeatedly merge the lowest-rank pair present) on the
    full corpus alphabet. The equivalence holds because the merge
    table is WELL-FORMED — every operand is a single char or an
    earlier merge's product, so a merge can only create new pairs
    involving its own (later-rank) token, never re-enable an earlier
    rank. Also pins token-boundary safety: a pair pattern must not
    match a token suffix/prefix."""
    import itertools

    from spark_hive_spark.operators.textstats import BPE_MERGES

    ranks = {pair: i for i, pair in enumerate(BPE_MERGES)}
    # the table is well-formed: operands are chars or earlier products
    made = set()
    for a, b in BPE_MERGES:
        assert len(a) == 1 or a in made, (a, b)
        assert len(b) == 1 or b in made, (a, b)
        made.add(a + b)

    def reference_bpe(word: str) -> list[str]:
        toks = list(word)
        while True:
            pairs = {
                (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
            }
            cand = [p for p in pairs if p in ranks]
            if not cand:
                return toks
            a, b = min(cand, key=ranks.get)
            out, i = [], 0
            while i < len(toks):  # leftmost non-overlapping fuse
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out

    def chain_bpe(word: str) -> list[str]:
        s = "".join(f"|{c}|" for c in word)
        for a, b in BPE_MERGES:
            s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
        return [t for t in s.split("|") if t]

    words = [
        "the", "then", "theater", "and", "standing", "ties",
        "inn", "announcer", "thethe", "aaaa", "ingesting",
        "xxandxx", "bathe", "result", "oration",
    ] + ["".join(p) for p in itertools.product("thean", repeat=3)]
    for w in words:
        assert chain_bpe(w) == reference_bpe(w), w


def test_canonical_url_rules(spark):
    """Each canonicalization rule in isolation and in combination:
    authority lowercased but PATH CASE PRESERVED, default ports
    stripped only for the matching scheme, fragments dropped,
    utm_* params removed while non-tracking params survive, one
    trailing slash stripped.

    NOTE: uses the shared ``spark`` fixture — calling get_spark()
    inside a test RE-APPLIES _DEFAULT_CONF to the live session via
    builder.getOrCreate(), silently clobbering the fixture's
    shuffle-partition setting for every later test (this broke the
    AQE skew-activation test two full-suite runs in a row)."""
    from spark_hive_spark.operators.curation import canonical_url

    from pyspark.sql import functions as F
    cases = {
        "HTTP://WWW.Example.COM/Path/File": "http://www.example.com/Path/File",
        "http://example.com:80/a": "http://example.com/a",
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:443/a": "http://example.com:443/a",  # kept
        "http://example.com:8080/a": "http://example.com:8080/a",  # kept
        "http://example.com/a#frag": "http://example.com/a",
        "http://example.com/a?utm_source=x&utm_b=y": "http://example.com/a",
        "http://example.com/a?id=7&utm_medium=m": "http://example.com/a?id=7",
        "http://example.com/a/": "http://example.com/a",
        "HTTPS://HOST.COM:443/A/B/?utm_x=1#f": "https://host.com/A/B",
    }
    df = spark.createDataFrame(
        [(k,) for k in cases], "u string"
    ).select("u", canonical_url(F.col("u")).alias("c"))
    got = {r["u"]: r["c"] for r in df.collect()}
    assert got == cases


def test_avro_ocf_reader():
    """Avro OCF framing: zigzag varints round-trip across the full
    int64 range, records decode by the EMBEDDED schema's field
    order, multi-block files verify every sync marker, and framing
    damage — truncated blocks, corrupted sync, non-null codecs —
    fails loudly."""
    import pytest

    from spark_hive_spark.operators.avro import (
        decode_varint,
        encode_avro_ocf,
        encode_varint,
        parse_avro_ocf,
    )

    for n in (0, -1, 1, 63, -64, 2**31, -(2**31) - 1,
              2**63 - 1, -(2**63)):
        v, pos = decode_varint(encode_varint(n), 0)
        assert (v, pos) == (n, len(encode_varint(n))), n

    schema = {
        "type": "record",
        "name": "T",
        # field order intentionally differs from insertion order of
        # the record dicts below — decoding must follow the SCHEMA
        "fields": [
            {"name": "b", "type": "string"},
            {"name": "a", "type": "long"},
            {"name": "c", "type": "double"},
        ],
    }
    recs = [
        {"a": i * 7 - 3, "b": "x" * i, "c": i * 0.25} for i in range(9)
    ]
    blob = encode_avro_ocf(recs, schema, records_per_block=4)
    got_schema, got = parse_avro_ocf(blob)
    assert got == recs
    assert [f["name"] for f in got_schema["fields"]] == ["b", "a", "c"]

    with pytest.raises(ValueError):
        parse_avro_ocf(blob[:-3])  # truncated final sync
    corrupt = bytearray(blob)
    corrupt[-8] ^= 0xFF  # flip a final-sync byte
    with pytest.raises(ValueError):
        parse_avro_ocf(bytes(corrupt))
    with pytest.raises(ValueError):
        parse_avro_ocf(b"NotAvro" + blob)

    # deflate codec: raw RFC 1951 block payloads round-trip and
    # actually compress the repetitive fixture
    dblob = encode_avro_ocf(recs, schema, records_per_block=4,
                            codec="deflate")
    _, dgot = parse_avro_ocf(dblob)
    assert dgot == recs
    with pytest.raises(ValueError):
        parse_avro_ocf(dblob[:-20])  # truncated deflate block
    # snappy codec: raw snappy + the spec's CRC32-of-uncompressed
    # trailer; a flipped CRC byte fails loudly
    sblob = encode_avro_ocf(recs, schema, records_per_block=4,
                            codec="snappy")
    _, sgot = parse_avro_ocf(sblob)
    assert sgot == recs
    scorrupt = bytearray(sblob)
    scorrupt[-17] ^= 0xFF  # last byte of the final block's CRC32
    with pytest.raises(ValueError):
        parse_avro_ocf(bytes(scorrupt))

    # unsupported codec is a loud seam (byte-length change reframes
    # the map, so either check may trip first)
    with pytest.raises((NotImplementedError, ValueError)):
        parse_avro_ocf(blob.replace(b"null", b"zstandard", 1))


def test_snappy_codec():
    """Raw snappy against the public format description: round-trips
    (with real compression on repetitive input), handcrafted vectors
    for all three copy forms incl. OVERLAPPING copies (offset <
    length replicates the run), long literals, and loud failures on
    truncation, bad offsets, and length-header mismatches."""
    import pytest

    from spark_hive_spark.operators.snappy import (
        snappy_compress,
        snappy_decompress,
    )

    cases = [
        b"", b"a", b"abcd" * 100, bytes(range(256)) * 4, b"x" * 1000,
        b"the quick brown fox " * 50, bytes(200),
    ]
    for c in cases:
        assert snappy_decompress(snappy_compress(c)) == c
    assert len(snappy_compress(b"abcd" * 100)) < 40  # real compression

    # overlapping copy: literal 'Q', then copy(offset=1, len=10)
    hand = bytes([11, 0 << 2]) + b"Q" + bytes([(9 << 2) | 0b10, 1, 0])
    assert snappy_decompress(hand) == b"Q" * 11
    # copy-1 form (tag 01): len=4, offset=4 after 4-byte literal
    hand = bytes([8, 3 << 2]) + b"abcd" + bytes([0b01, 4])
    assert snappy_decompress(hand) == b"abcdabcd"
    # copy-4 form (tag 11)
    hand = (bytes([8, 3 << 2]) + b"wxyz"
            + bytes([(3 << 2) | 0b11]) + (4).to_bytes(4, "little"))
    assert snappy_decompress(hand) == b"wxyzwxyz"

    for bad in (
        snappy_compress(b"hello world")[:-3],  # truncated literal
        bytes([4, (3 << 2) | 0b10, 9, 0]),  # offset beyond output
        bytes([9, 0 << 2]) + b"Q",  # length header vs actual output
    ):
        with pytest.raises(ValueError):
            snappy_decompress(bad)


def test_zstd_frame_layer():
    """zstd frame machinery per RFC 8878: XXH64 matches the JVM
    implementation (checked live against Spark's XxHash64 in the
    module's build-out; pinned here by the published empty-input
    value), Raw/RLE-block frames round-trip across every
    Frame_Content_Size width and the block-size cap, and damage —
    bad magic, truncation, flipped checksum, reserved bits,
    compressed blocks, dictionary IDs — fails loudly."""
    import pytest

    from spark_hive_spark.operators.zstd import (
        xxh64,
        zstd_compress,
        zstd_decompress,
    )

    assert xxh64(b"") == 0xEF46DB3751D8E999  # canonical vector

    cases = [
        b"", b"a", b"ab", b"z" * 5000, bytes(range(256)) * 600,
        b"Q" * 131071, b"R" * 131072,  # block cap - 1 / cap
        b"s" * 300,  # 1-byte FCS
        bytes(range(100)) * 700,  # 2-byte FCS (n - 256 form)
    ]
    for c in cases:
        for ck in (True, False):
            assert zstd_decompress(zstd_compress(c, checksum=ck)) == c
    # RLE actually engages: a run compresses far below raw
    assert len(zstd_compress(b"x" * 100000)) < 50

    z = zstd_compress(b"hello world zstd")
    with pytest.raises(ValueError):
        zstd_decompress(b"XXXX" + z[4:])  # magic
    with pytest.raises(ValueError):
        zstd_decompress(z[:-2])  # truncated checksum
    corrupt = bytearray(z)
    corrupt[-1] ^= 0xFF
    with pytest.raises(ValueError):
        zstd_decompress(bytes(corrupt))  # checksum mismatch
    hdr = bytearray(z)
    hdr[4] |= 0x03  # dictionary-ID flag bits
    with pytest.raises(NotImplementedError):
        zstd_decompress(bytes(hdr))
    blk = bytearray(z)
    blk[4 + 1 + 1] |= 0b100  # block type -> Compressed (garbage body)
    with pytest.raises(ValueError):
        zstd_decompress(bytes(blk))


def test_zstd_real_file_differential():
    """The complete zstd decoder against the REAL zstd CLI: output
    produced by the reference implementation at several levels
    (incl. --ultra and --long) over text / runs / mixed / binary
    corpora must decode byte-identically, and our Raw/RLE frames
    must be accepted by the reference tool. Skips when no zstd
    binary is present (the differential record then rests on the
    in-repo round-trip + tamper tests)."""
    import random
    import shutil
    import subprocess

    import pytest

    from spark_hive_spark.operators.zstd import (
        zstd_compress,
        zstd_decompress,
    )

    cli = shutil.which("zstd")
    if cli is None:
        pytest.skip("no zstd binary on PATH for differential testing")

    random.seed(41)
    words = [b"alpha", b"beta", b"gamma", b"longer-phrase", b"\x00\x01"]
    cases = {
        "text": b" ".join(random.choice(words) for _ in range(20000)),
        "runs": b"".join(
            bytes([i % 7]) * random.randrange(1, 50) for i in range(400)
        ),
        "rand": bytes(random.randrange(256) for _ in range(60000)),
        "zeros": b"\x00" * 300000,
    }
    for lvl in ("-1", "-9", "-19", "--ultra -22", "--long=27 -12"):
        for name, data in cases.items():
            z = subprocess.run(
                [cli, *lvl.split(), "-c"], input=data, capture_output=True
            ).stdout
            assert zstd_decompress(z) == data, (lvl, name)
    # and the reference tool accepts our Raw/RLE frames
    for data in (b"", cases["text"], cases["zeros"]):
        r = subprocess.run(
            [cli, "-d", "-c"], input=zstd_compress(data),
            capture_output=True,
        )
        assert r.returncode == 0 and r.stdout == data


def test_cas_commit_publishes_complete_manifests(tmp_path):
    """ADVICE r10: the CAS primitive must publish manifests
    atomically — a reader listing the directory can never observe an
    empty/partial v{n}.json, and the losing committer must leave the
    winner's bytes untouched and no temp debris behind."""
    import json

    from spark_hive_spark.sources.evolution import _cas_commit

    mdir = str(tmp_path)
    assert _cas_commit(mdir, 0, ["a.parquet", "b.parquet"])
    # loser: slot taken -> False, winner's manifest intact
    assert not _cas_commit(mdir, 0, ["evil.parquet"])
    with open(tmp_path / "v0.json") as fh:
        m = json.load(fh)
    assert m == {"version": 0, "files": ["a.parquet", "b.parquet"]}
    # no temp files linger after either outcome
    assert sorted(p.name for p in tmp_path.iterdir()) == ["v0.json"]
    # every visible manifest is complete, parseable JSON at all times
    assert _cas_commit(mdir, 1, ["c.parquet"])
    for p in tmp_path.iterdir():
        json.load(open(p))


def test_murmur3_published_vectors():
    """The hand-built murmur3_x86_32 against Appleby's published
    vectors plus the Iceberg spec's Appendix-B long-hash vector
    (hashLong(34) = 2017239379 — the value the bucket transform
    is defined over)."""
    import struct

    from spark_hive_spark.sources.evolution import (
        iceberg_bucket_long,
        murmur3_x86_32,
    )

    assert murmur3_x86_32(b"") == 0
    assert murmur3_x86_32(b"", 1) == 0x514E28B7
    assert murmur3_x86_32(b"", 0xFFFFFFFF) == 0x81F16F39
    assert murmur3_x86_32(b"test") == 0xBA6BD213
    assert murmur3_x86_32(b"Hello, world!", 1234) == 0xFAF6CDB3
    assert (
        murmur3_x86_32(
            b"The quick brown fox jumps over the lazy dog", 0x9747B28C
        )
        == 0x2FA826CD
    )
    # Iceberg spec Appendix B
    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379
    # ints hash as longs, so bucket assignments agree across widths
    assert iceberg_bucket_long(34, 16) == (2017239379 & 0x7FFFFFFF) % 16


def test_dsir_approx_agrees_with_exact(spark):
    """The percentile-cut DSIR twin (scale path, no global sort) must
    track the exact rank-cut query: per-language doc counts identical,
    selected counts within the tie band at the cut, and the selection
    downward-closed in weight. Run at sf0.01; the audit query's three
    verdicts must all come back TRUE there too."""
    sf = "/root/testdata/sf0.01"
    exact = {
        r["lang"]: r
        for r in all_queries()[
            "curation_dsir_importance_select"
        ].fn(spark, sf).collect()
    }
    approx = {
        r["lang"]: r
        for r in all_queries()[
            "curation_dsir_importance_select_approx"
        ].fn(spark, sf).collect()
    }
    assert set(exact) == set(approx) and exact
    n = sum(r["n_docs"] for r in exact.values())
    for lang, e in exact.items():
        a = approx[lang]
        assert a["n_docs"] == e["n_docs"]
    tot_exact = sum(r["n_selected"] for r in exact.values())
    tot_approx = sum(r["n_selected"] for r in approx.values())
    assert tot_exact == n // 5
    # the value cut keeps whole tie bands; allow the same slack the
    # audit brackets (sketch rank error + ties)
    assert abs(tot_approx - tot_exact) <= max(1, n // 1000) + 50

    audit = all_queries()["dsir_approx_audit"].fn(spark, sf).collect()
    assert len(audit) == 1
    row = audit[0]
    assert row["n_docs"] == n
    assert row["n_selected_exact"] == n // 5
    assert row["threshold_separates"]
    assert row["selection_bracket_ok"]
    assert row["disagreement_bounded"]


def test_avro_logical_types_roundtrip():
    """Avro unions + the new primitives + logical types: the
    ["null", T] idiom (zigzag union index), bytes-decimal with
    NEGATIVE two's-complement unscaled values, int-date,
    timestamp-micros, boolean — byte-exact encode/parse roundtrip
    across codecs, plus loud truncation/invalid-boolean errors."""
    import pytest as _pytest

    from spark_hive_spark.operators.avro import (
        _dec_field,
        _min_signed_bytes,
        encode_avro_ocf,
        parse_avro_ocf,
    )

    schema = {
        "type": "record", "name": "t",
        "fields": [
            {"name": "amount",
             "type": ["null", {"type": "bytes",
                               "logicalType": "decimal",
                               "precision": 12, "scale": 2}]},
            {"name": "day", "type": {"type": "int",
                                     "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "flag", "type": "boolean"},
        ],
    }
    rows = [
        {"amount": _min_signed_bytes(-1875), "day": 9132,
         "ts": 800_000_000_000_123, "flag": True},
        {"amount": None, "day": 0, "ts": 0, "flag": False},
        {"amount": _min_signed_bytes(2**70), "day": -365,
         "ts": -1, "flag": True},  # >64-bit unscaled + pre-epoch
    ]
    for codec in ("null", "deflate", "snappy", "zstandard"):
        blob = encode_avro_ocf(rows, schema, codec=codec)
        got_schema, got = parse_avro_ocf(blob)
        assert got == rows
        amount_t = got_schema["fields"][0]["type"][1]
        assert amount_t["logicalType"] == "decimal"
        assert int.from_bytes(got[0]["amount"], "big",
                              signed=True) == -1875
        assert int.from_bytes(got[2]["amount"], "big",
                              signed=True) == 2**70

    # negative sign extension is minimal-length
    assert _min_signed_bytes(-1) == b"\xff"
    assert _min_signed_bytes(127) == b"\x7f"
    assert _min_signed_bytes(128) == b"\x00\x80"
    # invalid boolean byte is loud
    with _pytest.raises(ValueError, match="boolean"):
        _dec_field(b"\x02", 0, "boolean")
    # out-of-range union index is loud
    with _pytest.raises(ValueError, match="union index"):
        _dec_field(b"\x04", 0, ["null", "long"])


def test_avro_complex_types_roundtrip():
    """Round 15: enum / fixed / map / nested record round-trip, and
    the validation paths are loud."""
    import pytest

    from spark_hive_spark.operators.avro import (
        _dec_field,
        _enc_field,
        encode_avro_ocf,
        parse_avro_ocf,
    )

    sch = {"type": "record", "name": "R", "fields": [
        {"name": "status",
         "type": {"type": "enum", "name": "S",
                  "symbols": ["F", "O", "P"]}},
        {"name": "sig",
         "type": {"type": "fixed", "name": "G", "size": 4}},
        {"name": "tags", "type": {"type": "map", "values": "long"}},
        {"name": "inner",
         "type": {"type": "record", "name": "I", "fields": [
             {"name": "a", "type": "long"},
             {"name": "b", "type": "string"}]}},
    ]}
    recs = [
        {"status": "P", "sig": b"\x01\x02\x03\x04",
         "tags": {"x": 1, "y": -2}, "inner": {"a": 7, "b": "hi"}},
        {"status": "F", "sig": b"\xff\xff\xff\xff",
         "tags": {}, "inner": {"a": -1, "b": ""}},
    ]
    _, back = parse_avro_ocf(encode_avro_ocf(recs, sch, codec="null"))
    assert back == recs

    enum_t = {"type": "enum", "name": "S", "symbols": ["A", "B"]}
    with pytest.raises(ValueError, match="not in symbols"):
        _enc_field("C", enum_t)
    with pytest.raises(ValueError, match="out of range"):
        _dec_field(b"\x08", 0, enum_t)  # zigzag 8 -> index 4
    fixed_t = {"type": "fixed", "name": "G", "size": 4}
    with pytest.raises(ValueError, match="size 4"):
        _enc_field(b"\x00", fixed_t)
    with pytest.raises(ValueError, match="truncated Avro fixed"):
        _dec_field(b"\x00\x00", 0, fixed_t)


def test_avro_map_negative_block_count_decodes():
    """Spec: a negative map block count is followed by the block's
    byte size; the decoder must honor it."""
    from spark_hive_spark.operators.avro import (
        _dec_field,
        _enc_field,
        encode_varint,
    )

    map_t = {"type": "map", "values": "long"}
    body = _enc_field({"k": 5}, map_t)
    # rewrite the single block with a negative count + byte size
    inner = body[len(encode_varint(1)):-len(encode_varint(0))]
    neg = encode_varint(-1) + encode_varint(len(inner)) + inner \
        + encode_varint(0)
    val, pos = _dec_field(neg, 0, map_t)
    assert val == {"k": 5} and pos == len(neg)


def test_avro_none_container_is_loud():
    """ADVICE r15: a None value for a NON-UNION array/map type must
    raise, not silently encode as an empty container (only unions may
    carry null)."""
    import pytest

    from spark_hive_spark.operators.avro import _enc_field

    arr_t = {"type": "array", "items": "long"}
    map_t = {"type": "map", "values": "long"}
    with pytest.raises(ValueError, match="non-union Avro array"):
        _enc_field(None, arr_t)
    with pytest.raises(ValueError, match="non-union Avro map"):
        _enc_field(None, map_t)
    # unions still carry null; empty containers still encode
    assert _enc_field(None, ["null", arr_t]) == b"\x00"
    assert _enc_field([], arr_t) == b"\x00"
    assert _enc_field({}, map_t) == b"\x00"


def test_iceberg_bucket_long_vec_matches_scalar():
    """The numpy murmur3 bucket transform (used by the hidden-
    partitioning fixture writer) is bit-exact against the scalar
    spec implementation, including extreme int64 values."""
    import numpy as np

    from spark_hive_spark.sources.evolution import (
        iceberg_bucket_long,
        iceberg_bucket_long_vec,
    )

    vals = np.concatenate([
        np.arange(0, 300_000, 197, dtype=np.int64),
        np.array([-1, -(2**63), 2**63 - 1, 0, 12345678901234],
                 dtype=np.int64),
    ])
    for n in (8, 16):
        got = iceberg_bucket_long_vec(vals, n)
        assert got.tolist() == [
            iceberg_bucket_long(int(x), n) for x in vals
        ]
