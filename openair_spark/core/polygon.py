"""Polygon validation / fixing operations.

Mirrors reference src/geojson-polygon.ts:

  - remove_duplicate_points  (greedy first-kept scan, :214-259)
  - remove_intermediate_points (spike removal, :265-327)
  - rewind / right-hand rule   (:204-208)
  - validate (structural + kinks, :48-57)
  - create_fixed_polygon (dedup -> despike -> unkink -> RHR -> largest,
    envelope fallback, :143-199)

The unkink step re-implements the ring-walking decomposition of the
`simplepolygon` algorithm vendored by turf's unkinkPolygon: augmented
ring (intersections inserted on both edges), stack walk popping closed
sub-rings at repeated intersection points; popped rings start at the
intersection vertex (matches reference tests/fixtures/fixed-self-intersecting.json,
whose largest ring starts/ends at the full-precision intersection point).
"""

from __future__ import annotations

from .errors import ParserError
from .geo import (
    boolean_clockwise,
    distance_km,
    bearing,
    envelope_ring,
    ring_area_m2,
    ring_self_intersections,
    rewind_ring,
    segment_intersection,
    segment_intersection_det,
)

ERR_RING_TOO_FEW = "Each LinearRing of a Polygon must have 4 or more Positions."
ERR_RING_OPEN = "First and last Position are not equivalent."
ERR_TOO_SMALL = "The polygon dimensions are too small to create a polygon."


def create_polygon_ring(coords: list) -> list:
    """turf.polygon helper invariants: >=4 positions, closed ring
    (value compare) — raises the turf error strings the reference
    surfaces in its messages."""
    if len(coords) < 4:
        raise ValueError(ERR_RING_TOO_FEW)
    first, last = coords[0], coords[-1]
    if first[0] != last[0] or first[1] != last[1]:
        raise ValueError(ERR_RING_OPEN)
    return coords


def remove_duplicate_points(ring: list, consume_duplicate_buffer: float = 0.0) -> list:
    """Greedy first-kept dedup with haversine buffer (km = buffer/1000);
    re-closes the ring afterwards (src/geojson-polygon.ts:214-259)."""
    if len(ring) < 4:
        raise ValueError("Polygon must at least have four coordinates")
    import numpy as np

    min_allowed_km = consume_duplicate_buffer / 1000.0
    if min_allowed_km < 0.0:
        # negative buffers are rejected at config resolution (reference
        # AsGeojsonConfigSchema: consumeDuplicateBuffer z.number().min(0),
        # src/airspace.ts:20-31); reject here too so a direct call can't
        # silently diverge (the scalar reference loop would drop nothing)
        raise ValueError(
            f"consume_duplicate_buffer must be >= 0, got {consume_duplicate_buffer!r}")
    processed: list = []
    if min_allowed_km == 0.0:
        # haversine(p, q) <= 0 iff p == q bit-for-bit (deg2rad is
        # fmod+multiply, sin(x)=0 only at x=0, cos never exactly 0 in
        # float64), so the default-buffer dedup is exact value dedup —
        # no pairwise matrix needed
        seen: set = set()
        for coord in ring:
            key = (coord[0], coord[1])
            if key not in seen:
                seen.add(key)
                processed.append(coord)
    elif len(ring) <= 2048:
        # one vectorized pairwise haversine (symmetric, bit-identical to
        # the scalar call), then the greedy first-kept scan
        arr = np.asarray([c[:2] for c in ring], dtype=np.float64)
        dmat = distance_km(arr[:, None, :], arr[None, :, :])
        kept_mask = np.zeros(len(ring), dtype=bool)
        dup = dmat <= min_allowed_km
        for i, coord in enumerate(ring):
            if not bool((dup[:, i] & kept_mask).any()):
                processed.append(coord)
                kept_mask[i] = True
    else:
        # untrusted mega-ring: the full n x n matrix would allocate
        # O(n^2) float64 inside an Arrow worker; test each candidate
        # against the kept prefix instead (same elementwise haversine,
        # bit-identical per pair, O(n * kept) memory O(n))
        arr = np.asarray([c[:2] for c in ring], dtype=np.float64)
        kept_buf = np.empty_like(arr)
        nk = 0
        for i, coord in enumerate(ring):
            if nk and bool(
                    (distance_km(kept_buf[:nk], arr[i]) <= min_allowed_km).any()):
                continue
            kept_buf[nk] = arr[i]
            nk += 1
            processed.append(coord)
    # the value-equal closing point is always consumed above, so re-close
    processed.append(processed[0])
    if len(processed) < 4:
        raise ValueError(ERR_TOO_SMALL)
    return processed


def remove_intermediate_points(ring: list, greedy_variance: float = 0.0) -> list:
    """Spike removal: drop point i when some consecutive pair (A=ring[j],
    B=ring[j+1]) with j+1 < i sees bearings from i differing by
    180 +/- greedy_variance (src/geojson-polygon.ts:265-327).

    The ring-closing last element is treated as "same object as first"
    (it always is by the time this runs in the reference pipeline), so
    the ring is only re-closed when the last survivor differs in value.
    """
    import numpy as np

    # The reference scans the ORIGINAL ring for every candidate, so the
    # whole predicate precomputes as one broadcast bearing matrix:
    #   B[i, j] = bearing(ring[i] -> ring[j])   (bit-identical formula)
    #   drop i when any j with j+1 < i has |B[i,j] - B[i,j+1]| ~ 180
    # Chunked over i rows: rings are untrusted crawl input, and the full
    # n x n matrix would allocate O(n^2) float64 inside an Arrow worker.
    arr = np.asarray([c[:2] for c in ring], dtype=np.float64)
    n = len(arr)
    j_idx = np.arange(n - 1)
    intermediate = np.zeros(n, dtype=bool)
    block = max(1, 4_000_000 // max(n, 1))
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        bmat = bearing(arr[lo:hi, None, :], arr[None, :, :])
        delta = np.abs(bmat[:, :-1] - bmat[:, 1:])  # (b, n-1): j-th pair
        in_band = (delta >= 180.0 - greedy_variance) & (delta <= 180.0 + greedy_variance)
        intermediate[lo:hi] = (
            in_band & (j_idx[None, :] + 1 < np.arange(lo, hi)[:, None])
        ).any(axis=1)

    fixed: list = [ring[0]]
    for i in range(1, n):
        if not intermediate[i]:
            fixed.append(ring[i])
    first, last = fixed[0], fixed[-1]
    if first[0] != last[0] or first[1] != last[1]:
        fixed.append(fixed[0])
    return fixed


def validate_polygon(ring: list) -> None:
    """Structural check (check-geojson analogue) + kinks scan
    (src/geojson-polygon.ts:48-57). Raises ValueError with the message
    the reference surfaces."""
    create_polygon_ring(ring)
    for position in ring:
        if not all(isinstance(v, (int, float)) and v == v for v in position[:2]):
            raise ValueError("Position contains an invalid number")
    if ring_self_intersections(ring):
        raise ValueError("Geometry is invalid due to self intersection")


def get_self_intersections(ring: list) -> list:
    return ring_self_intersections(ring)


def _augment_ring(ring: list) -> list:
    """Insert each self-intersection point on both of its edges, ordered
    along the edge by the interpolation fraction."""
    nseg = len(ring) - 1
    per_edge: list[list] = [[] for _ in range(nseg)]
    for i in range(nseg):
        for k in range(i, nseg):
            if i == k or abs(i - k) == 1 or (i == 0 and k == nseg - 1):
                continue
            pt = segment_intersection_det(ring[i], ring[i + 1], ring[k], ring[k + 1])
            if pt is None:
                continue
            for edge in (i, k):
                x1, y1 = ring[edge]
                x2, y2 = ring[edge + 1]
                dx, dy = x2 - x1, y2 - y1
                frac = ((pt[0] - x1) * dx + (pt[1] - y1) * dy) / (dx * dx + dy * dy)
                per_edge[edge].append((frac, [pt[0], pt[1]]))
    augmented: list = []
    for i in range(nseg):
        augmented.append(ring[i])
        for _, pt in sorted(per_edge[i], key=lambda t: t[0]):
            augmented.append(pt)
    augmented.append(ring[-1])
    return augmented


def unkink_ring(ring: list) -> list[list]:
    """Split a (possibly self-intersecting) closed ring into simple
    closed sub-rings. Popped sub-rings start at their intersection
    vertex; the residual ring keeps the original start vertex."""
    if not ring_self_intersections(ring):
        return [list(ring)]
    augmented = _augment_ring(ring)
    rings: list[list] = []
    stack: list = []
    seen: dict[tuple, int] = {}
    for pt in augmented:
        key = (pt[0], pt[1])
        if key in seen and not _is_ring_close(stack, pt):
            start_idx = seen[key]
            sub = stack[start_idx:] + [list(pt)]
            if len(sub) >= 4:
                rings.append(sub)
            # drop popped loop, keep one occurrence of the intersection
            for dropped in stack[start_idx + 1:]:
                seen.pop((dropped[0], dropped[1]), None)
            stack = stack[: start_idx + 1]
        else:
            seen[key] = len(stack)
            stack.append(list(pt))
    if len(stack) >= 3:
        residual = stack + ([stack[0]] if stack[0] != stack[-1] else [])
        if len(residual) >= 4:
            rings.append(residual)
    return rings


def _is_ring_close(stack: list, pt) -> bool:
    """The final closing vertex equals the start vertex — that repeat is
    ring closure, not an intersection revisit, when it is the ring's
    first vertex at stack position 0 and the walk is at the end."""
    return bool(stack) and stack[0][0] == pt[0] and stack[0][1] == pt[1]


def outer_boundary_ring(ring: list) -> list:
    """Outer boundary of the union of the regions enclosed by a
    (possibly self-intersecting) closed ring — the JTS
    noder+polygonizer result for a buffer curve, re-expressed as a
    planar-graph walk: node the curve at its self-intersections, then
    from the lowest vertex walk edge-to-edge always taking the
    clockwise-most continuation, which keeps the union's exterior on
    one side. Used by the airway buffer for multi-segment polylines.
    """
    if not ring_self_intersections(ring):
        return [list(p) for p in ring]
    aug = _augment_ring(ring)
    # directed edge adjacency (skip zero-length after augmentation)
    adj: dict[tuple, list] = {}
    for a, b in zip(aug[:-1], aug[1:]):
        ka, kb = (a[0], a[1]), (b[0], b[1])
        if ka == kb:
            continue
        adj.setdefault(ka, []).append(kb)
        adj.setdefault(kb, []).append(ka)

    import math as _math

    start = min(adj, key=lambda p: (p[1], p[0]))  # lowest, then leftmost
    # first step: from the lowest vertex every edge points upward; the
    # smallest polar angle starts a counterclockwise outer walk
    first = min(adj[start],
                key=lambda w: _math.atan2(w[1] - start[1], w[0] - start[0]))
    walk = [start, first]
    prev, cur = start, first
    for _ in range(4 * len(aug)):
        if cur == start:
            break
        base = _math.atan2(prev[1] - cur[1], prev[0] - cur[0])
        best = None
        for w in adj[cur]:
            if w == cur:
                continue
            a = _math.atan2(w[1] - cur[1], w[0] - cur[0])
            turn = (a - base) % (2.0 * _math.pi)
            if turn < 1e-12:  # straight back: only if dead end
                turn = 2.0 * _math.pi
            # outer continuation = SMALLEST ccw angle from the reversed
            # incoming edge (keeps the enclosed union on the walk's
            # interior side for the ccw start convention above)
            if best is None or turn < best[0]:
                best = (turn, w)
        prev, cur = cur, best[1]
        walk.append(cur)
    if walk[-1] != walk[0]:
        raise ValueError("outer boundary walk did not close")
    return [list(p) for p in walk]


def get_largest_polygon(rings: list[list]) -> list:
    """Largest-area ring wins; later ties win (>=) —
    src/geojson-polygon.ts:110-132."""
    if not rings:
        raise ValueError("Polygons must contain at least one polygon geometry")
    largest = rings[0]
    largest_area = ring_area_m2(rings[0])
    for ring in rings[1:]:
        area = ring_area_m2(ring)
        if area >= largest_area:
            largest_area = area
            largest = ring
    return largest


def create_fixed_polygon(coordinates: list, consume_duplicate_buffer: float = 0.0) -> list:
    """dedup -> despike -> unkink -> RHR -> largest, with envelope
    fallback (src/geojson-polygon.ts:143-199). Returns a closed ring."""
    if len(coordinates) < 3:
        raise ParserError("Polygon must have at least 3 coordinates")
    coords = list(coordinates)
    try:
        first, last = coords[0], coords[-1]
        if first[0] != last[0] or first[1] != last[1]:
            coords.append(coords[0])
        ring = create_polygon_ring(coords)
        ring = remove_duplicate_points(ring, consume_duplicate_buffer)
        ring = remove_intermediate_points(ring)
        sub_rings = unkink_ring(ring)
        sub_rings = [rewind_ring(r) for r in sub_rings]
        return get_largest_polygon(sub_rings)
    except Exception:
        # envelope fallback: bbox of all input points
        try:
            return envelope_ring(coordinates)
        except Exception as err:  # pragma: no cover
            raise SyntaxError(str(err) or "Unknown error occured.") from None
