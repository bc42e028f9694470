"""Perceptual image hashing (multimodal.image_ahash /
image_near_dup_pairs): hand-computed hash law, identical-image pairs at
hamming 0, band-join equality with brute force, near-dup tolerance to a
small edit, and undecodable-payload nulls."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_scripts_spark.operators import jpeg, multimodal


def test_ahash_hand_computed_two_tone():
    """A 16x16 grayscale image, left half 10 and right half 200: cells in
    the bright half (cx >= 4) are above the global mean, so the hash has
    exactly the bits 8*cy+cx with cx >= 4 set."""
    img = np.full((16, 16, 1), 10, dtype=np.uint8)
    img[:, 8:, 0] = 200
    want = 0
    for cy in range(8):
        for cx in range(4, 8):
            want |= 1 << (8 * cy + cx)
    want = want - (1 << 64) if want >= 1 << 63 else want
    assert multimodal._ahash64(img) == want


def test_ahash_rgb_luma_weighting():
    """A pure-red half vs pure-green half: green carries more luma
    (587 > 299), so only the green half's bits set."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :, 0] = 255  # top: red
    img[4:, :, 1] = 255  # bottom: green
    h = multimodal._ahash64(img)
    for cy in range(8):
        for cx in range(8):
            bit = (h >> (8 * cy + cx)) & 1
            assert bit == (1 if cy >= 4 else 0)


def test_identical_images_pair_at_hamming_zero(spark):
    """Two doc_ids carrying the SAME pixel payload must pair at 0."""
    import pandas as pd

    payload = multimodal.synthetic_pixel_image_bytes(5)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "payload": [payload, payload, multimodal.synthetic_pixel_image_bytes(11)]})
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.image_near_dup_pairs(df, max_hamming=0).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_band_join_equals_brute_force(spark):
    """The pigeonhole band join finds EXACTLY the brute-force pairs at
    hamming <= 3 over the signature table."""
    import pandas as pd

    payloads = [multimodal.synthetic_pixel_image_bytes(d) for d in range(24)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(24)), "payload": payloads})
    )
    sigs = {
        r["doc_id"]: r["ahash"] for r in multimodal.image_ahash(df).collect()
    }
    want = set()
    for a in sigs:
        for b in sigs:
            if a < b and bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in multimodal.image_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert got == want


def test_small_edit_stays_near(spark):
    """A JPEG re-encode of the same DC-block pattern with ONE block
    nudged slightly hashes within a few bits of the original."""
    d = 8
    orig = jpeg.decode_jpeg_pixels(jpeg.synthetic_jpeg_bytes(d))
    edited = orig.copy()
    edited[:8, :8, :] = np.clip(edited[:8, :8, :].astype(int) + 4, 0, 255).astype(
        np.uint8
    )
    ha, hb = multimodal._ahash64(orig), multimodal._ahash64(edited)
    assert bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= 3


def test_undecodable_payload_yields_null_signature(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not an image at all"]})
    )
    rows = multimodal.image_ahash(df).collect()
    assert len(rows) == 1 and rows[0]["ahash"] is None
    assert multimodal.image_near_dup_pairs(df).count() == 0


def test_audio_ehash_hand_computed_and_scale_invariant():
    """128 samples: first half amplitude 100, second half 1000 — bits set
    exactly on frames 32..63; halving every amplitude leaves the hash
    unchanged (both sides of the cross-multiply scale together)."""
    x = np.concatenate(
        [np.full(64, 100, dtype=np.int16), np.full(64, 1000, dtype=np.int16)]
    )
    want = 0
    for j in range(32, 64):
        want |= 1 << j
    want = want - (1 << 64) if want >= 1 << 63 else want
    assert multimodal._audio_ehash64(x) == want
    assert multimodal._audio_ehash64(x // 2) == want


def test_audio_identical_payload_pairs(spark):
    import pandas as pd

    payload = multimodal.synthetic_wav_bytes(9)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "payload": [payload, payload, b"junk, not a wav"],
            }
        )
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.audio_near_dup_pairs(df, max_hamming=0).collect()
    }
    assert pairs == {(1, 2): 0}
    sigs = multimodal.audio_ehash(df).collect()
    assert sum(1 for r in sigs if r["ahash"] is None) == 1


def test_null_doc_id_rows_are_skipped_not_fatal(spark):
    """A NULL id (outer-join debris) quarantines like a bad payload —
    the Arrow stage never fails the task on it."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.array([1, None], dtype="Int64"),
                "payload": [multimodal.synthetic_pixel_image_bytes(3)] * 2,
            }
        )
    )
    rows = multimodal.image_ahash(df).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1


def test_signature_dup_clusters_group_size_safe(spark):
    """Clusters match the pairwise ground truth, but work never goes
    quadratic in identical-signature group size: 60 copies of one image
    + 2 copies of a near variant + distinct others."""
    import pandas as pd

    base = multimodal.synthetic_pixel_image_bytes(5)
    rows = [(i, base) for i in range(60)]
    rows += [(100, multimodal.synthetic_pixel_image_bytes(23))] * 1
    rows += [(101, multimodal.synthetic_pixel_image_bytes(23))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "payload"]))
    got = {
        r["doc_id"]: r["cluster"]
        for r in multimodal.image_dup_clusters(df, max_hamming=0).collect()
    }
    assert len(got) == 62
    # the 60 copies share one cluster; the 2 variants share another
    assert len({got[i] for i in range(60)}) == 1
    assert got[100] == got[101]
    assert got[0] != got[100]


def test_signature_clusters_agree_with_pairwise_truth(spark):
    """On a mixed corpus, cluster co-membership equals the transitive
    closure of the pairwise near-dup relation."""
    import pandas as pd

    from etl_scripts_spark.operators.dedup import connected_components

    payloads = [multimodal.synthetic_pixel_image_bytes(d) for d in range(20)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(20)), "payload": payloads})
    )
    pairs = multimodal.image_near_dup_pairs(df, max_hamming=3)
    want_comp = {
        r["id"]: r["component"]
        for r in connected_components(pairs.select("id_a", "id_b")).collect()
    }
    got = {
        r["doc_id"]: r["cluster"]
        for r in multimodal.image_dup_clusters(df, max_hamming=3).collect()
    }
    # same partition of doc ids (labels may differ only by representative)
    def parts(m):
        inv = {}
        for k, v in m.items():
            inv.setdefault(v, set()).add(k)
        return {frozenset(v) for v in inv.values()}

    full_got = parts(got)
    # pairwise CC omits singletons; add them from got's domain
    want = parts({k: want_comp.get(k, k) for k in got})
    assert full_got == want


def test_image_dup_clusters_custom_id_col(spark):
    import pandas as pd

    payload = multimodal.synthetic_pixel_image_bytes(4)
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": [7, 8], "payload": [payload, payload]})
    )
    got = {
        r["image_id"]: r["cluster"]
        for r in multimodal.image_dup_clusters(df, id_col="image_id").collect()
    }
    assert set(got) == {7, 8} and got[7] == got[8]
