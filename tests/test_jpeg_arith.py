"""Arithmetic (SOF9) + lossless (SOF3) JPEG codecs (round 11).

test_oracle_parity.py certifies the registered ``multimodal_jpeg_arith``
/ ``multimodal_jpeg_lossless`` chains against exact integer ground
truth; here we pin what the fixture shape can't see: arbitrary-content
roundtrips, the DIFFERENTIAL oracle against the already-certified
Huffman codec (same blocks, both encoders, identical decode — this is
what certifies the transcribed Table D.3 state machine end-to-end),
adaptation actually compressing, every predictor, the modulo-65536
reconstruction edge, restart re-initialization, and the loud guard
boundaries (subsampled SOF9, Pt != 0, truncation, wrong-process SOFs).
"""

from __future__ import annotations

import random

import pytest

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg import _make_jpeg_codec
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import (
    _make_jpeg_ext_codec,
    _make_synth_jpeg_arith,
    _make_synth_jpeg_lossless,
)


@pytest.fixture(scope="module")
def codec():
    return _make_jpeg_ext_codec()


def _random_blocks(rng, ncomp, nblk, lo=-1000, hi=1000, density=25):
    comps = []
    for _c in range(ncomp):
        blocks = []
        for _b in range(nblk):
            blk = [0] * 64
            for k in rng.sample(range(64), rng.randint(0, density)):
                blk[k] = rng.randint(lo, hi)
            blocks.append(blk)
        comps.append(blocks)
    return comps


def test_arith_roundtrip_random_coefficients(codec):
    """encode→decode is exact for arbitrary quantized coefficients
    across component counts, non-8-aligned dimensions, restart
    intervals, and magnitudes through several X1/X2 ladder rungs."""
    enc, dec, _, _, _ = codec
    rng = random.Random(11)
    for trial in range(25):
        ncomp = 1 if trial % 2 else 3
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        nblk = -(-w // 8) * (-(-h // 8))
        quant = [1 + (k % 5) for k in range(64)]
        comps = _random_blocks(rng, ncomp, nblk)
        ri = rng.choice([0, 0, 1, 2, 3])
        w2, h2, nc2, out = dec(enc(comps, w, h, quant, restart_interval=ri))
        assert (w2, h2, nc2) == (w, h, ncomp)
        for c in range(ncomp):
            for b in range(nblk):
                assert out[c][b] == [
                    comps[c][b][k] * quant[k] for k in range(64)
                ]


def test_arith_differential_vs_huffman_codec(codec):
    """The differential oracle: identical quantized blocks encoded by
    the certified Huffman codec (operators/jpeg.py) and by the SOF9
    arithmetic codec must decode to identical dequantized coefficients.
    The Huffman chain is certified against embedded ground truth by the
    driver oracle, so agreement here certifies the QM coder + F.1.4
    statistical models end-to-end, independent of the fixture shape."""
    enc_h, dec_h, *_ = _make_jpeg_codec()
    enc_a, dec_a, _, _, _ = codec
    rng = random.Random(7)
    for trial in range(15):
        ncomp = 1 if trial % 2 else 3
        w, h = rng.randint(8, 32), rng.randint(8, 24)
        nblk = -(-w // 8) * (-(-h // 8))
        quant = [rng.randint(1, 4) for _ in range(64)]
        comps = _random_blocks(rng, ncomp, nblk, -100, 100)
        rh = dec_h(enc_h(comps, w, h, quant))
        ra = dec_a(enc_a(comps, w, h, quant))
        assert rh == ra


def test_arith_adaptation_compresses(codec):
    """A biased source (mostly-zero blocks) must compress BELOW the
    Huffman encoding of the same content — the signature that Table
    D.3 state adaptation is actually running, not just roundtripping."""
    enc_h, _, *_ = _make_jpeg_codec()
    enc_a, _, _, _, _ = codec
    quant = [1] * 64
    comps = [[[0] * 64 for _ in range(48)]]
    for b in range(48):
        comps[0][b][0] = b % 2  # tiny DC wiggle, empty AC
    ph = enc_h(comps, 16 * 8, 3 * 8, quant)
    pa = enc_a(comps, 16 * 8, 3 * 8, quant)
    assert len(pa) < len(ph)


def test_arith_fixture_family_decodes(codec):
    """Every fixture id decodes to exactly the formula the SQL oracle
    recomputes (spot-check of the registered query's ground truth)."""
    _, dec, _, _, _ = codec
    build = _make_synth_jpeg_arith()
    for i in range(12):
        w, h, nc, comps = dec(build(i))
        assert (w, h) == (17 + i % 16, 9 + i % 14)
        assert nc == (1 if i % 2 == 0 else 3)
        nblk = -(-w // 8) * (-(-h // 8))
        for c in range(nc):
            assert len(comps[c]) == nblk
            for b in range(nblk):
                for u in range(8):
                    for v in range(8):
                        q = 1 + (u + v + i) % 3
                        if u + v <= 2:
                            want = ((i + 3 * c + 5 * b + 7 * u + 11 * v) % 9 - 4) * q
                        elif (u, v) == (7, 7):
                            want = ((i + c) % 3 - 1) * q
                        else:
                            want = 0
                        assert comps[c][b][u * 8 + v] == want


def test_arith_guards(codec):
    enc, dec, _, _, _ = codec
    good = _make_synth_jpeg_arith()(5)
    with pytest.raises(ValueError, match="SOI"):
        dec(b"\x89PNG")
    # Huffman SOF under the arith decoder redirects loudly
    i = good.index(bytes([0xFF, 0xC9]))
    huff = good[: i + 1] + bytes([0xC0]) + good[i + 2 :]
    with pytest.raises(ValueError, match="Huffman SOF"):
        dec(huff)
    # out-of-range sampling factors refuse loudly (subsampled 1..4
    # decodes since r12 — certified by the differential suite below)
    sub = bytearray(good)
    sub[i + 11] = 0x51  # Hi=5: outside T.81's 1..4
    with pytest.raises(ValueError, match="outside 1..4"):
        dec(bytes(sub))
    # truncation: dropping the EOI + final code bytes must stay loud
    with pytest.raises(ValueError, match="entropy data ran past|RSTn"):
        dec(good[:-8])
    # arith decoder never hangs or silently succeeds on corrupted
    # entropy bytes: flipping scan bytes either raises or changes coefs
    sos = good.index(bytes([0xFF, 0xDA]))
    base = dec(good)
    flipped = 0
    for off in range(sos + 14, min(sos + 22, len(good) - 4)):
        bad = bytearray(good)
        bad[off] ^= 0x55
        try:
            got = dec(bytes(bad))
            flipped += got != base
        except (ValueError, NotImplementedError):
            flipped += 1
    assert flipped > 0


def test_arith_progressive_roundtrip(codec):
    """SOF10 encode→decode is exact across component counts, odd
    dimensions, restart intervals and random sparsity — every scan
    kind in the script (DC first/refine, AC band first/refine) runs."""
    _, dec, _, _, enc_p = codec
    rng = random.Random(19)
    for trial in range(15):
        ncomp = 1 if trial % 2 else 3
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        nblk = -(-w // 8) * (-(-h // 8))
        quant = [1 + (k % 5) for k in range(64)]
        comps = _random_blocks(rng, ncomp, nblk)
        ri = rng.choice([0, 0, 1, 2, 3])
        got = dec(enc_p(comps, w, h, quant, restart_interval=ri))
        assert got == (
            w,
            h,
            ncomp,
            [
                [[blk[k] * quant[k] for k in range(64)] for blk in c]
                for c in comps
            ],
        )


def test_arith_progressive_differential_vs_huffman_progressive(codec):
    """Identical blocks through the certified Huffman PROGRESSIVE codec
    and the SOF10 arithmetic-progressive codec decode identically (and
    equal the sequential decodes) — certifying the Annex G QM models
    against ground truth independent of the fixture shape."""
    huff = _make_jpeg_codec()
    dec_h, enc_hp = huff[1], huff[4]
    enc_a, dec_a, _, _, enc_p = codec
    rng = random.Random(23)
    for trial in range(8):
        ncomp = 1 if trial % 2 else 3
        w, h = rng.randint(8, 32), rng.randint(8, 24)
        nblk = -(-w // 8) * (-(-h // 8))
        quant = [rng.randint(1, 4) for _ in range(64)]
        comps = _random_blocks(rng, ncomp, nblk, -100, 100)
        r_hp = dec_h(enc_hp(comps, w, h, quant))
        r_ap = dec_a(enc_p(comps, w, h, quant))
        r_as = dec_a(enc_a(comps, w, h, quant))
        assert r_hp == r_ap == r_as


def test_arith_progressive_fixture_family_decodes(codec):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import (
        _make_synth_jpeg_arith_prog,
    )

    _, dec, _, _, _ = codec
    seq = _make_synth_jpeg_arith()
    prog = _make_synth_jpeg_arith_prog()
    for i in range(10):
        # same content family: the progressive decode must equal the
        # sequential decode of the same id
        assert dec(prog(i)) == dec(seq(i))


def test_lossless_roundtrip_all_predictors(codec):
    """Exact roundtrip for every H.1 predictor, both component counts,
    awkward dimensions (1-wide, 1-tall), and random 8-bit content."""
    _, _, enc, dec, _ = codec
    rng = random.Random(3)
    shapes = [(1, 9), (9, 1), (5, 4), (16, 11), (2, 2)]
    for pred in range(1, 8):
        for w, h in shapes:
            for ncomp in (1, 3):
                planes = [
                    [rng.randint(0, 255) for _ in range(w * h)]
                    for _ in range(ncomp)
                ]
                got = dec(enc(planes, w, h, predictor=pred))
                assert got == (w, h, ncomp, planes)


def test_lossless_extreme_values_roundtrip(codec):
    """All-0, all-255, and checkerboard planes roundtrip exactly —
    the diffs swing the SSSS category range both ways."""
    _, _, enc, dec, _ = codec
    w, h = 8, 6
    for plane in (
        [0] * (w * h),
        [255] * (w * h),
        [255 * ((x + y) % 2) for y in range(h) for x in range(w)],
    ):
        for pred in (1, 4, 7):
            got = dec(enc([plane], w, h, predictor=pred))
            assert got[3] == [plane]


def test_lossless_fixture_family_decodes(codec):
    _, _, _, dec, _ = codec
    build = _make_synth_jpeg_lossless()
    for i in range(15):
        w, h, nc, planes = dec(build(i))
        assert (w, h) == (5 + i % 12, 3 + i % 9)
        assert nc == (1 if i % 2 == 0 else 3)
        for c in range(nc):
            assert planes[c] == [
                (i + 7 * c + 13 * x + 29 * y + (x * y) % 7) % 256
                for y in range(h)
                for x in range(w)
            ]


def test_lossless_guards(codec):
    _, _, enc, dec, _ = codec
    good = _make_synth_jpeg_lossless()(4)
    with pytest.raises(ValueError, match="bad predictor"):
        enc([[0] * 4], 2, 2, predictor=8)
    # non-lossless SOF under the lossless decoder redirects loudly
    i = good.index(bytes([0xFF, 0xC3]))
    base = good[: i + 1] + bytes([0xC0]) + good[i + 2 :]
    with pytest.raises(ValueError, match="not the lossless process"):
        dec(base)
    # Pt != 0 refuses: patch the SOS approximation byte (last header
    # byte before entropy data)
    sos = good.index(bytes([0xFF, 0xDA]))
    ns = good[sos + 4]
    al_at = sos + 4 + 1 + 2 * ns + 2
    pt = bytearray(good)
    pt[al_at] = 0x01
    with pytest.raises(NotImplementedError, match="point transform"):
        dec(bytes(pt))
    # truncated entropy data stays loud
    with pytest.raises(ValueError, match="ran dry|marker inside"):
        dec(good[:-6])


def test_auto_router_picks_by_sof(codec):
    """The format router (the actual pick-and-decode callable) routes
    every supported SOF to the right decoder, skips T.81 fill bytes and
    standalone markers, redirects SOF3, surfaces the informative
    per-SOF refusal for hierarchical processes, and refuses junk."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg import _make_jpeg_codec
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import (
        _make_jpeg_router,
        _make_synth_jpeg_lossless,
    )

    route = _make_jpeg_router()
    dec_h = _make_jpeg_codec()[1]
    _, dec_a, _, _, _ = codec
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg import _make_synth_jpeg

    huff = _make_synth_jpeg()(4)
    arith = _make_synth_jpeg_arith()(4)
    assert route(huff) == dec_h(huff)
    assert route(arith) == dec_a(arith)
    # a fill byte before the SOF marker (T.81 B.1.1.2) is skipped, not
    # misparsed as a length-bearing segment
    i = huff.index(bytes([0xFF, 0xC0]))
    padded = huff[:i] + b"\xff" + huff[i:]
    assert route(padded) == dec_h(huff)
    # SOF3 redirects to the lossless stats path by name
    with pytest.raises(NotImplementedError, match="lossless"):
        route(_make_synth_jpeg_lossless()(2))
    # hierarchical SOF surfaces the Huffman decoder's informative
    # per-SOF refusal, not a generic 'no SOF found'
    hier = huff[: i + 1] + bytes([0xC5]) + huff[i + 2 :]
    with pytest.raises(NotImplementedError, match="SOF5"):
        route(hier)
    # junk refuses loudly
    with pytest.raises(ValueError, match="SOI"):
        route(b"\x89PNG")
    with pytest.raises(ValueError, match="no SOF"):
        route(b"\xff\xd8\xff\xd9")


def test_spark_auto_stats_mixed_corpus(spark):
    """decode_jpeg_auto_stats over a union of Huffman-baseline and
    arithmetic payloads in ONE mapInPandas stage: rows equal the
    per-flavor decoders' rows; a lossless payload in the mix raises."""
    from pyspark.sql import functions as F

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg import synthesize_jpeg_media
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import (
        decode_jpeg_auto_stats,
        decode_jpeg_arith_stats,
        synthesize_jpeg_ext_media,
    )

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    huff = synthesize_jpeg_media(ids.where(F.col("doc_id") % 2 == 0))
    arith = synthesize_jpeg_ext_media(
        ids.where(F.col("doc_id") % 2 == 1), flavor="arith"
    )
    got = (
        decode_jpeg_auto_stats(huff.unionByName(arith))
        .orderBy("media_id")
        .collect()
    )
    assert len(got) == 8
    want_arith = (
        decode_jpeg_arith_stats(arith).orderBy("media_id").collect()
    )
    assert [r for r in got if r.media_id % 2 == 1] == want_arith
    # a lossless payload in a coefficient-stats corpus refuses loudly
    lossless = synthesize_jpeg_ext_media(
        ids.where(F.col("doc_id") == 0), flavor="lossless"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="lossless|SOF3"):
        decode_jpeg_auto_stats(lossless).collect()


def test_spark_stats_paths(spark):
    """The registered mapInPandas plumbing end-to-end on a small id
    frame: schema, row count, and one exact row per flavor."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import (
        decode_jpeg_arith_stats,
        decode_jpeg_lossless_stats,
        synthesize_jpeg_ext_media,
    )

    ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    arith = (
        decode_jpeg_arith_stats(synthesize_jpeg_ext_media(ids, flavor="arith"))
        .orderBy("media_id")
        .collect()
    )
    assert len(arith) == 10
    assert arith[0]["width"] == 17 and arith[0]["height"] == 9
    lossless = (
        decode_jpeg_lossless_stats(
            synthesize_jpeg_ext_media(ids, flavor="lossless")
        )
        .orderBy("media_id")
        .collect()
    )
    assert len(lossless) == 10
    r = lossless[3]  # id=3: w=8, h=6, nc=3, predictor 4
    assert (r["width"], r["height"], r["n_components"]) == (8, 6, 3)
    assert r["n_samples"] == 8 * 6 * 3
    want = sum(
        (3 + 7 * c + 13 * x + 29 * y + (x * y) % 7) % 256
        for c in range(3)
        for y in range(6)
        for x in range(8)
    )
    assert r["px_sum"] == want


def test_arith_subsampled_differential_vs_huffman(codec):
    """r12 (VERDICT r11 #5): subsampled SOF9/SOF10. The QM entropy
    layer is orthogonal to MCU geometry, so the interleave walkers
    mirror jpeg.py's certified ones — proven differentially: the same
    quantized blocks encoded through the arithmetic and Huffman
    encoders must decode identically, over randomized dimensions,
    sampling factors (4:2:0/4:2:2/4:4:0/odd shapes), restart intervals
    and sparsity. The progressive reference is the Huffman PROGRESSIVE
    roundtrip (both drop AC in padding blocks outside the natural grid
    per T.81 A.2.2 — comparing against the sequential path would
    demand AC data no progressive stream carries)."""
    enc_h, dec_h, _i, _px, enc_hp = _make_jpeg_codec()
    enc_a, dec_a, _el, _dl, enc_ap = codec
    rng = random.Random(1207)
    samplings = [
        [(2, 2), (1, 1), (1, 1)],  # 4:2:0
        [(2, 1), (1, 1), (1, 1)],  # 4:2:2
        [(1, 2), (1, 1), (1, 1)],  # 4:4:0
        [(2, 2), (2, 1), (1, 1)],  # mixed
        [(4, 1), (1, 1), (2, 1)],  # extreme ratio
    ]
    for trial in range(12):
        w = 9 + rng.randrange(40)
        h = 9 + rng.randrange(30)
        samp = samplings[trial % len(samplings)]
        ri = trial % 4
        hmax = max(x for x, _ in samp)
        vmax = max(y for _, y in samp)
        nmcu = -(-w // (8 * hmax)) * -(-h // (8 * vmax))
        quant = [1 + (k % 3) for k in range(64)]
        comps = [
            _random_blocks(rng, 1, nmcu * hi * vi, lo=-40, hi=40)[0]
            for hi, vi in samp
        ]
        pj = enc_h(comps, w, h, quant, sampling=samp, restart_interval=ri)
        pa = enc_a(comps, w, h, quant, restart_interval=ri, sampling=samp)
        assert dec_a(pa) == dec_h(pj), f"trial {trial}: sequential"
        pjp = enc_hp(comps, w, h, quant, sampling=samp, restart_interval=ri)
        pp = enc_ap(comps, w, h, quant, restart_interval=ri, sampling=samp)
        assert dec_a(pp) == dec_h(pjp), f"trial {trial}: progressive"
