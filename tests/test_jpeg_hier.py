"""Hierarchical JPEG (T.81 Annex J, round 11).

test_oracle_parity.py certifies the registered ``multimodal_jpeg_hier``
pyramid (DC-only exact path) against integer ground truth INCLUDING
the expansion filter replayed in SQL; here we pin what that fixture
shape can't see: arbitrary-coefficient roundtrips against the shared
reconstruction pipeline, deeper pyramids, same-resolution differential
refinement, the expansion filter against a scalar reference, and the
loud boundaries (DHP under the non-hierarchical decoders, unsupported
frame kinds, dimension mismatches, truncation).
"""

from __future__ import annotations

import random

import pytest

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_hier import (
    _make_jpeg_hier_codec,
    _make_synth_jpeg_hier,
)


@pytest.fixture(scope="module")
def codec():
    return _make_jpeg_hier_codec()


def _rnd_frame(rng, ncomp, fw, fh, density=0.3, lo=-60, hi=60):
    nb = (-(-fw // 8)) * (-(-fh // 8))
    return [
        [
            [
                rng.randint(lo, hi) if rng.random() < density else 0
                for _ in range(64)
            ]
            for _ in range(nb)
        ]
        for _ in range(ncomp)
    ]


def test_two_level_roundtrip_vs_reconstruction(codec):
    """decode(encode(frames)) equals the shared integer reconstruction
    pipeline for ARBITRARY coefficients (general float IDCT + rounding),
    across component counts, odd dims, and quant tables."""
    enc, dec, recon = codec
    rng = random.Random(31)
    for trial in range(20):
        ncomp = 1 if trial % 2 else 3
        w, h = rng.randint(2, 30), rng.randint(2, 24)
        hw, hh = -(-w // 2), -(-h // 2)
        quant = [rng.randint(1, 3) for _ in range(64)]
        frames = [
            ("full", hw, hh, _rnd_frame(rng, ncomp, hw, hh)),
            ("diff", w, h, _rnd_frame(rng, ncomp, w, h)),
        ]
        p = enc(frames, w, h, quant)
        got = dec(p)
        assert got[:3] == (w, h, ncomp)
        assert got[3] == recon(frames, w, h, quant)


def test_three_level_pyramid_and_same_res_refinement(codec):
    """A quarter→half→full pyramid with TWO EXP expansions plus a
    trailing same-resolution differential refinement (no EXP) decodes
    to the shared reconstruction."""
    enc, dec, recon = codec
    rng = random.Random(7)
    w, h = 20, 12
    qw, qh = 5, 3
    hw, hh = 10, 6
    frames = [
        ("full", qw, qh, _rnd_frame(rng, 1, qw, qh)),
        ("diff", hw, hh, _rnd_frame(rng, 1, hw, hh)),
        ("diff", w, h, _rnd_frame(rng, 1, w, h)),
        ("diff", w, h, _rnd_frame(rng, 1, w, h)),  # same-res refinement
    ]
    p = enc(frames, w, h)
    got = dec(p)
    assert got[3] == recon(frames, w, h)


def test_expansion_filter_reference(codec):
    """The (a+b+1)>>1 H-then-V expansion against a scalar reference
    implementation, odd and even output dims, edge replication."""
    import numpy as np

    enc, dec, recon = codec
    rng = random.Random(3)
    # reach the internal filter through reconstruct: a 'full' frame at
    # (hw, hh) then a zero 'diff' frame at (w, h) → the output IS
    # expand(half plane), compared against a scalar H-then-V
    # reimplementation of the (a+b+1)>>1 kernel with edge replication
    for w, h in ((9, 7), (10, 8), (2, 2), (15, 3)):
        hw, hh = -(-w // 2), -(-h // 2)
        bw, bh = -(-hw // 8), -(-hh // 8)
        frame = [[[0] * 64 for _ in range(bw * bh)]]
        for b in range(bw * bh):
            frame[0][b][0] = 8 * rng.randint(-50, 50)
        zero = [[[0] * 64 for _ in range((-(-w // 8)) * (-(-h // 8)))]]
        out = recon(
            [("full", hw, hh, frame), ("diff", w, h, zero)], w, h
        )[0]
        # scalar reference
        half = [
            [128 + frame[0][(y // 8) * bw + (x // 8)][0] // 8 for x in range(hw)]
            for y in range(hh)
        ]
        wide = [
            [
                half[y][x // 2]
                if x % 2 == 0
                else (half[y][x // 2] + half[y][min(x // 2 + 1, hw - 1)] + 1) >> 1
                for x in range(2 * hw)
            ]
            for y in range(hh)
        ]
        tall = []
        for y in range(2 * hh):
            if y % 2 == 0:
                tall.append(wide[y // 2])
            else:
                ny = min(y // 2 + 1, hh - 1)
                tall.append(
                    [
                        (wide[y // 2][x] + wide[ny][x] + 1) >> 1
                        for x in range(2 * hw)
                    ]
                )
        want = [tall[y][x] for y in range(h) for x in range(w)]
        assert out == want, (w, h)


def test_fixture_family_decodes(codec):
    _, dec, _ = codec
    build = _make_synth_jpeg_hier()
    for i in range(8):
        w, h, nc, planes = dec(build(i))
        assert (w, h) == (10 + i % 12, 6 + i % 9)
        assert nc == (1 if i % 2 == 0 else 3)
        assert all(0 <= v <= 255 for pl in planes for v in pl)


def test_guards(codec):
    enc, dec, _ = codec
    good = _make_synth_jpeg_hier()(4)
    # the NON-hierarchical decoders refuse a DHP stream loudly instead
    # of silently decoding only the first frame
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg import _make_jpeg_codec
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import (
        _make_jpeg_ext_codec,
        _make_jpeg_router,
    )

    with pytest.raises(NotImplementedError, match="jpeg_hier"):
        _make_jpeg_codec()[1](good)
    with pytest.raises(NotImplementedError, match="jpeg_hier"):
        _make_jpeg_ext_codec()[1](good)
    with pytest.raises(NotImplementedError, match="sample stats"):
        _make_jpeg_router()(good)
    # a differential frame before any reference is invalid
    frames = [("diff", 8, 8, [[[8] + [0] * 63]])]
    with pytest.raises(ValueError, match="first frame"):
        enc(frames, 8, 8)
    # final frame must land on the DHP dimensions
    with pytest.raises(ValueError, match="DHP"):
        enc([("full", 8, 8, [[[8] + [0] * 63]])], 16, 16)
    # unsupported frame kinds under the hier decoder stay loud
    i = good.index(bytes([0xFF, 0xC5]))
    prog = good[: i + 1] + bytes([0xC6]) + good[i + 2 :]
    with pytest.raises(NotImplementedError, match="SOF6"):
        dec(prog)
    # a dimension-doubling differential frame WITHOUT its mandatory EXP
    # marker is rejected, not silently expanded (T.81 Annex J)
    iexp = good.index(bytes([0xFF, 0xDF]))
    noexp = good[:iexp] + good[iexp + 5 :]  # drop the EXP segment
    with pytest.raises(ValueError, match="without a preceding EXP"):
        dec(noexp)
    # restart intervals refuse loudly (not a misleading bit-reader error)
    dri = good[:2] + bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x02]) + good[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        dec(dri)
    # truncated entropy data is loud
    with pytest.raises(ValueError, match="ran dry|missing DHP"):
        dec(good[:-12])


def test_spark_stats_path(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_hier import (
        decode_jpeg_hier_stats,
        synthesize_jpeg_hier_media,
    )

    ids = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    rows = (
        decode_jpeg_hier_stats(synthesize_jpeg_hier_media(ids))
        .orderBy("media_id")
        .collect()
    )
    assert len(rows) == 10
    r = rows[0]  # id 0: w=10, h=6, grayscale
    assert (r["width"], r["height"], r["n_components"]) == (10, 6, 1)
    assert r["n_samples"] == 60
