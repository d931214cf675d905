"""H3 index tests: published known-value anchors, roundtrip exactness,
hierarchy and pentagon properties.

Known values come from the public H3 documentation examples (uber/h3):
the latLngToCell quickstart cell, its res-8 parent, its gridDisk ring,
and the pentagon base-cell list.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from openair_spark.index import h3

SF_LAT, SF_LNG = 37.7752702151959257, -122.4183682373046875
SF_CELL_9 = 0x8928308280FFFFF
PENTAGONS = [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]


def test_known_value_latlng_to_cell():
    assert int(h3.latlng_to_cell(SF_LAT, SF_LNG, 9)) == SF_CELL_9
    assert h3.cell_to_string(SF_CELL_9) == "8928308280fffff"


def test_known_value_cell_to_latlng():
    lat, lng = h3.cell_to_latlng(SF_CELL_9)
    assert abs(lat - 37.77670234943567) < 1e-12
    assert abs(lng - -122.41845932318311) < 1e-12


def test_known_value_parent():
    assert h3.cell_to_string(h3.cell_to_parent(SF_CELL_9, 8)) == "8828308281fffff"


def test_known_value_grid_disk():
    expected = sorted(int(s, 16) for s in [
        "8928308280fffff", "8928308280bffff", "89283082807ffff",
        "89283082877ffff", "89283082803ffff", "89283082873ffff",
        "8928308283bffff"])
    assert sorted(h3.grid_disk(SF_CELL_9, 1)) == expected


def test_pentagon_base_cells():
    t = h3._tables()
    assert [bc for bc in range(122) if t["is_pent"][bc]] == PENTAGONS


def test_base_cell_centers_roundtrip():
    for bc, (lat, lng) in enumerate(h3.base_cell_centers()):
        cell = int(h3.latlng_to_cell(lat, lng, 0))
        assert h3.get_base_cell(cell) == bc
        assert h3.get_resolution(cell) == 0


@pytest.mark.parametrize("res", [0, 1, 2, 4, 5, 8, 9])
def test_roundtrip_center_identity(res):
    """cellToLatLng -> latLngToCell is the identity for every cell —
    including pentagon regions and cells crossing icosahedron edges."""
    rng = np.random.default_rng(7)
    n = 3000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lon = rng.uniform(-180, 180, n)
    cells = np.unique(h3.latlng_to_cell(lat, lon, res))[:800]
    for c in cells:
        la, lo = h3.cell_to_latlng(int(c))
        assert int(h3.latlng_to_cell(la, lo, res)) == int(c)


def test_parent_child_closure():
    parent = h3.cell_to_parent(SF_CELL_9, 6)
    kids = h3.cell_to_children(parent, 8)
    assert len(kids) == 49
    for c in kids:
        assert h3.cell_to_parent(c, 6) == parent
    assert h3.cell_to_center_child(parent, 8) in kids


def test_pentagon_children_and_disk():
    pent = (1 << 59) | (4 << 45) | ((1 << 45) - 1)  # res-0 pentagon bc 4
    assert h3.is_pentagon(pent)
    kids1 = h3.cell_to_children(pent, 1)
    assert len(kids1) == 6  # pentagons lose the K child
    assert len(h3.cell_to_children(pent, 2)) == 41  # 6 + 5*7
    assert len(h3.grid_disk(pent, 1)) == 6  # self + 5 neighbors
    # the 5 non-center children surround the vertex at uniform 72 deg
    vlat, vlng = h3.cell_to_latlng(pent)
    azs = []
    for c in kids1:
        la, lo = h3.cell_to_latlng(c)
        if abs(la - vlat) < 1e-9 and abs(lo - vlng) < 1e-9:
            continue
        azs.append(math.degrees(float(h3._geo_azimuth(
            math.radians(vlat), math.radians(vlng),
            math.radians(la), math.radians(lo)))) % 360.0)
    azs = sorted(azs)
    gaps = [(azs[(i + 1) % 5] - azs[i]) % 360 for i in range(5)]
    assert all(abs(g - 72.0) < 1e-6 for g in gaps)


def test_grid_disk_sizes_hexagon():
    for k, n in [(1, 7), (2, 19), (3, 37)]:
        assert len(h3.grid_disk(SF_CELL_9, k)) == n


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(3)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 500)))
    lon = rng.uniform(-180, 180, 500)
    vec = h3.latlng_to_cell(lat, lon, 7)
    for idx in range(0, 500, 37):
        assert int(h3.latlng_to_cell(float(lat[idx]), float(lon[idx]), 7)) == int(vec[idx])


def test_parent_containment_statistical():
    """H3 children overhang their parents slightly; the res-chain parent
    should still agree with direct assignment for the vast majority."""
    rng = np.random.default_rng(11)
    n = 4000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lon = rng.uniform(-180, 180, n)
    c9 = h3.latlng_to_cell(lat, lon, 9)
    c7 = h3.latlng_to_cell(lat, lon, 7)
    par = np.array([h3.cell_to_parent(int(c), 7) for c in c9])
    assert (par == c7).mean() > 0.93


def test_h3_cover_superset_and_full_cells():
    """Cover invariant: every point inside the ring has its cell (at some
    cover res) in the cover; FULL cover cells' centers are inside."""
    from openair_spark.ops.h3tiles import h3_cover

    ring = np.array([[9.5, 49.5], [11.5, 49.5], [11.5, 51.2],
                     [9.5, 51.2], [9.5, 49.5]])
    cover = h3_cover(ring, min_res=5, max_res=7)
    assert len(cover) > 0
    by_res: dict = {}
    for cell, res, full in cover:
        by_res.setdefault(res, set()).add(cell)
        if full:
            la, lo = h3.cell_to_latlng(cell)
            assert (9.5 <= lo <= 11.5) and (49.5 <= la <= 51.2)
    assert any(full for _, _, full in cover)  # compact: coarse FULL cells exist
    # compact-set membership: p covered iff an ancestor-or-self of its
    # max_res cell is in the cover (H3 parent/child is an index relation,
    # children overhang territories — mixed-res point lookups are wrong)
    rng = np.random.default_rng(2)
    plon = rng.uniform(9.55, 11.45, 300)
    plat = rng.uniform(49.55, 51.15, 300)
    max_res = max(by_res)
    for lo, la in zip(plon, plat):
        leaf = int(h3.latlng_to_cell(la, lo, max_res))
        covered = any(
            h3.cell_to_parent(leaf, res) in cells
            for res, cells in by_res.items())
        assert covered, (lo, la)


def test_h3_cover_compactness():
    """FULL cells stay at the coarsest fitting res: a big ring must not
    emit only max_res cells."""
    from openair_spark.ops.h3tiles import h3_cover

    ring = np.array([[8.0, 48.0], [13.0, 48.0], [13.0, 53.0],
                     [8.0, 53.0], [8.0, 48.0]])
    cover = h3_cover(ring, min_res=5, max_res=6)
    res_of_full = {res for _, res, full in cover if full}
    assert 5 in res_of_full


def test_boundary_contains_center():
    """Boundary vertices surround the center (diagnostic sanity)."""
    for cell in [SF_CELL_9, h3.cell_to_parent(SF_CELL_9, 5)]:
        lat, lng = h3.cell_to_latlng(cell)
        b = h3.cell_boundary(cell)
        lons = [p[0] for p in b]
        lats = [p[1] for p in b]
        assert min(lats) < lat < max(lats)
        assert min(lons) < lng < max(lons)


def test_vectorized_face_ijk_matches_scalar():
    """cells_to_face_ijk must reproduce the scalar inverse bit-for-bit,
    including pentagon rotations and overage-moved cells."""
    rng = np.random.default_rng(42)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 1200)))
    lon = rng.uniform(-180, 180, 1200)
    cells = np.concatenate([
        np.unique(h3.latlng_to_cell(lat, lon, res)) for res in (0, 1, 3, 6, 9)])
    f, i, j, k, r = h3.cells_to_face_ijk(cells)
    for idx in range(len(cells)):
        assert h3._h3_to_face_ijk(int(cells[idx])) == (
            int(f[idx]), int(i[idx]), int(j[idx]), int(k[idx]), int(r[idx]))


def test_vectorized_children_match_scalar():
    rng = np.random.default_rng(9)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 400)))
    lon = rng.uniform(-180, 180, 400)
    cells = np.unique(h3.latlng_to_cell(lat, lon, 4))[:120]
    pent0 = (1 << 59) | (4 << 45) | ((1 << 45) - 1)
    cells = np.concatenate([cells, np.array([pent0], dtype=np.int64)])
    kids = h3.cells_to_children_next(cells)
    want = sorted(c for cell in cells for c in h3.cell_to_children(int(cell), h3.get_resolution(int(cell)) + 1))
    assert sorted(int(c) for c in kids) == want


def test_boundary_forward_consistency_including_seams():
    """Substrate-exact boundaries: an edge midpoint nudged 3% toward the
    center must round (latlng_to_cell) to the cell; nudged outward it
    must not. Exercises cells crossing icosahedron edges (the round-2
    boundary was approximate there) and, since round 4, all 12 pentagons
    per res (exact 5-vertex boundary + class III distortion vertices).
    Antimeridian-wrapping and polar cells are skipped — lon/lat chord
    midpoints are meaningless there, an artifact of the test, not the
    boundary."""
    rng = np.random.default_rng(5)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 4000)))
    lon = rng.uniform(-180, 180, 4000)
    for res in (4, 5, 6, 7):
        cells = np.unique(h3.latlng_to_cell(lat, lon, res))[:500]
        pents = np.array([h3.cell_to_center_child(
            (1 << 59) | (bc << 45) | ((1 << 45) - 1), res)
            for bc in PENTAGONS], dtype=np.int64)
        cells = np.unique(np.concatenate([cells, pents]))
        bnds = h3.cells_to_boundaries(cells, distortion=True)
        cla, clo = h3.cells_to_latlng(cells)
        ok = ((bnds[:, :, 0].max(axis=1) - bnds[:, :, 0].min(axis=1)) < 90.0) \
            & (np.abs(cla) < 85.0)
        cells, bnds = cells[ok], bnds[ok]
        cla, clo = cla[ok], clo[ok]
        mid = (bnds + np.roll(bnds, -1, axis=1)) / 2.0
        ctr = np.stack([clo, cla], axis=-1)[:, None, :]
        pin = mid + (ctr - mid) * 0.03
        pout = mid - (ctr - mid) * 0.03
        nv = bnds.shape[1]
        cin = h3.latlng_to_cell(pin[:, :, 1].ravel(), pin[:, :, 0].ravel(),
                                res).reshape(-1, nv)
        cout = h3.latlng_to_cell(pout[:, :, 1].ravel(), pout[:, :, 0].ravel(),
                                 res).reshape(-1, nv)
        assert (cin == cells[:, None]).all(), f"res {res}: inward nudge escaped"
        assert (cout != cells[:, None]).all(), f"res {res}: outward nudge stayed"


def test_h3_cover_full_depth_res9():
    """The north-star mandate depth (res 5-9) runs, stays a superset,
    and emits res-9 leaves."""
    from openair_spark.ops.h3tiles import h3_cover

    ring = np.array([[9.5, 49.5], [11.5, 49.5], [11.5, 51.2],
                     [9.5, 51.2], [9.5, 49.5]])
    cover = h3_cover(ring, min_res=5, max_res=9, max_cells=200000)
    by_res: dict = {}
    for cell, res, _ in cover:
        by_res.setdefault(res, set()).add(cell)
    assert 9 in by_res and 5 in by_res
    rng = np.random.default_rng(2)
    plon = rng.uniform(9.55, 11.45, 400)
    plat = rng.uniform(49.55, 51.15, 400)
    for lo, la in zip(plon, plat):
        leaf = int(h3.latlng_to_cell(la, lo, 9))
        assert any(h3.cell_to_parent(leaf, res) in cells
                   for res, cells in by_res.items()), (lo, la)


def test_derived_tables_match_fixture():
    """The derived tables (base-cell homes, pentagon cw-offsets, overage
    transforms, centers) and a full res-1 sweep are locked as a fixture:
    any change to the derivation is a loud diff, not silent drift. The
    anchor-verified parts are listed in the fixture comment; the
    edge-midpoint home fallback is self-consistent but externally
    unverified (ADVICE r2) — this fixture is the recorded id set to
    cross-check against uber/h3 when an environment provides it."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures_h3_tables.json")
    with open(path) as f:
        fix = json.load(f)
    t = h3._tables()
    assert [[int(v) for v in row] for row in t["home"]] == fix["home"]
    assert [bool(b) for b in t["is_pent"]] == fix["is_pent"]
    assert {str(k): sorted(int(f) for f in v)
            for k, v in t["cw_offset"].items() if v} == fix["cw_offset"]
    assert {f"{f}:{q}": [int(g), [int(x) for x in tr], int(r)]
            for (f, q), (g, tr, r) in sorted(t["face_neighbors"].items())
            } == fix["face_neighbors"]
    res1 = []
    for bc in range(122):
        base = (1 << 59) | (bc << 45) | ((1 << 45) - 1)
        for c in h3.cell_to_children(base, 1):
            la, lo = h3.cell_to_latlng(c)
            res1.append([h3.cell_to_string(c), round(la, 9), round(lo, 9)])
    assert sorted(res1) == fix["res1_sweep"]
    b = h3.cells_to_boundaries(
        np.array([0x8928308280FFFFF], dtype=np.int64), distortion=True)[0]
    got = [[round(float(x), 12), round(float(y), 12)] for x, y in b]
    assert got == fix["sf_cell9_boundary"]


def test_h3_cover_superset_at_pentagon_sliver():
    """Cover superset must hold inside a pentagon's "chord sliver": the
    region between a class III pentagon's 5 substrate-vertex chords and
    its true (bulging) boundary, up to ~9.6% of the circumradius deep.
    Round 3 absorbed it with a 12% classification dilation; round 4
    computes the exact pentagon distortion vertices instead
    (index/h3.py cells_to_boundaries), so a tiny ring placed at the
    deepest point of the sliver must be covered with NO dilation — this
    is the regression test for that exactness."""
    from openair_spark.ops.h3tiles import h3_cover

    for bc in (14, 38, 49, 83):
        base = (1 << 59) | (bc << 45) | ((1 << 45) - 1)
        pent7 = h3.cell_to_center_child(base, 7)   # odd-res pentagon
        cla, clo = h3.cell_to_latlng(pent7)
        if abs(cla) > 80:
            continue
        b = h3.cells_to_boundaries(np.array([pent7], dtype=np.int64))[0][:5]
        lons = b[:, 0] + 360 * np.round((clo - b[:, 0]) / 360)
        b = np.stack([lons, b[:, 1]], axis=-1)
        ctr = np.array([clo, cla])
        # deepest sliver: binary-search outward from each chord midpoint
        # for where the forward function leaves the pentagon
        best = None
        for e in range(5):
            m = (b[e] + b[(e + 1) % 5]) / 2.0
            d = m - ctr
            lo_f, hi_f = 0.0, 0.6
            for _ in range(30):
                f = (lo_f + hi_f) / 2
                p = m + d * f
                if int(h3.latlng_to_cell(p[1], p[0], 7)) == pent7:
                    lo_f = f
                else:
                    hi_f = f
            if best is None or lo_f > best[0]:
                best = (lo_f, m, d)
        f, m, d = best
        p = m + d * (f * 0.5)
        assert int(h3.latlng_to_cell(p[1], p[0], 7)) == pent7
        th = np.linspace(0, 2 * np.pi, 25)
        rad = float(np.hypot(*d)) * f * 0.2
        ring = np.stack(
            [p[0] + rad * np.cos(th) / max(np.cos(np.radians(p[1])), 0.2),
             p[1] + rad * np.sin(th)], axis=-1)
        cover = h3_cover(ring, min_res=5, max_res=7)
        by_res: dict = {}
        for cell, res, _ in cover:
            by_res.setdefault(res, set()).add(cell)
        leaf = int(h3.latlng_to_cell(p[1], p[0], 7))
        assert any(h3.cell_to_parent(leaf, res) in cells
                   for res, cells in by_res.items()), bc
