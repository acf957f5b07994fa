"""dHash + image near-dup: spec parity against a loop-written reference,
decode roundtrip, and banded-join exactness vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _dhash_ref(img: np.ndarray) -> int:
    """Independent loop implementation of the module-docstring spec."""
    h, w = img.shape[0], img.shape[1]
    gray = [
        [
            (299 * int(img[y][x][0]) + 587 * int(img[y][x][1]) + 114 * int(img[y][x][2]))
            // 1000
            for x in range(w)
        ]
        for y in range(h)
    ]
    sums = [[0] * 9 for _ in range(8)]
    counts = [[0] * 9 for _ in range(8)]
    for py in range(h):
        for px in range(w):
            cy, cx = py * 8 // h, px * 9 // w
            sums[cy][cx] += gray[py][px]
            counts[cy][cx] += 1
    m = [[sums[y][x] // counts[y][x] for x in range(9)] for y in range(8)]
    out = 0
    for y in range(8):
        for x in range(8):
            if m[y][x] > m[y][x + 1]:
                out |= 1 << (y * 8 + x)
    return out


def _synth_img(k: int, h: int = 16, w: int = 16) -> np.ndarray:
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    base = ((k // 2) * 37 + y * 31 + x * 13 + c * 101) % 256
    if k % 2 == 1:
        pert = ((y < 2) & (x < 2) & (c == 0)) * 120
        base = (base + pert) % 256
    return base.astype(np.uint8)


def _ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def test_dhash_matches_loop_reference():
    from uk_address_matcher_ray.stages.imagehash import dhash64

    for k in [0, 1, 2, 3, 17, 254, 255]:
        img = _synth_img(k)
        assert dhash64(img) == _dhash_ref(img), k
    # non-divisible dims exercise the index-arithmetic cell partition
    img = _synth_img(5, h=13, w=22)
    assert dhash64(img) == _dhash_ref(img)


def test_dhash_rejects_tiny_images():
    from uk_address_matcher_ray.stages.imagehash import dhash64

    with pytest.raises(ValueError):
        dhash64(np.zeros((4, 20, 3), np.uint8))


def test_image_dhash_decodes_payloads(ray_session):
    import ray

    from uk_address_matcher_ray.stages.imagehash import dhash64, image_dhash

    ks = list(range(12))
    tbl = pa.table(
        {
            "media_id": pa.array([f"m{k}" for k in ks], pa.string()),
            "payload": pa.array([_ppm(_synth_img(k)) for k in ks], pa.binary()),
        }
    )
    out = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(ray.data.from_arrow(tbl)).take_all()
    }
    assert out == {f"m{k}": dhash64(_synth_img(k)) for k in ks}


def test_image_near_dup_pairs_exact_vs_bruteforce(ray_session):
    import ray

    from uk_address_matcher_ray.stages.imagehash import (
        dhash64,
        image_near_dup_pairs,
    )

    ks = list(range(40))
    tbl = pa.table(
        {
            "media_id": pa.array([f"m{k}" for k in ks], pa.string()),
            "payload": pa.array([_ppm(_synth_img(k)) for k in ks], pa.binary()),
        }
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dup_pairs(
            ray.data.from_arrow(tbl), max_hamming=3, bands=4
        ).take_all()
    }
    sigs = {f"m{k}": dhash64(_synth_img(k)) for k in ks}
    want = set()
    names = sorted(sigs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = bin(sigs[names[i]] ^ sigs[names[j]]).count("1")
            if d <= 3:
                a, b = sorted((names[i], names[j]))
                want.add((a, b, d))
    assert got == want
    # the designed perturbed twins land as near-dups
    assert any(a == "m0" and b == "m1" for a, b, _ in want)


def test_hamming_pairs_requires_exact_band_count(ray_session):
    import ray

    from uk_address_matcher_ray.stages.dedup import hamming_pairs

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(["a"]), "simhash": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError):
        hamming_pairs(ds, max_hamming=4, bands=4)
