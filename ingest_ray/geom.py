"""Geometry kernels: earcut triangulation, bboxes, point-in-polygon,
overlap areas.

* ``earcut`` re-implements the public Mapbox ear-clipping algorithm
  (ISC; same algorithm family as the ``earcutr`` crate the reference's
  golden test uses to pin triangle cells —
  /root/reference/tests/ingest.rs:52-53,71). Output is validated
  against the hardcoded cells vector for the multipolygon-with-hole
  fixture (``[0,1,4,5,4,1,3,0,4,6,5,1,3,4,6,6,1,2,2,3,6]``).
* bbox fold semantics follow /root/reference/src/lib.rs:228-235 and
  :357-363 (f32 min/max over *resolved distinct* nodes).
* ``overlap_area`` / ``coord_span_ge`` mirror
  /root/reference/src/divide.rs:74-99 in float32 — they decide quadtile
  ownership, so the arithmetic must match.
* ``points_in_polygon`` is a vectorized ray-casting test over packed
  ring buffers (numpy over Arrow list offsets, zero-copy).
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# earcut (Mapbox algorithm, scalar Python — runs per polygon inside
# map_batches; polygons are small on average, coastline-sized ones are
# bounded by the z-order indexed path below)
# --------------------------------------------------------------------------


class _Node:
    __slots__ = ("i", "x", "y", "prev", "next", "z", "prevZ", "nextZ", "steiner")

    def __init__(self, i: int, x: float, y: float):
        self.i = i
        self.x = x
        self.y = y
        self.prev = None
        self.next = None
        self.z = 0
        self.prevZ = None
        self.nextZ = None
        self.steiner = False


def earcut(data, hole_indices=None, dim: int = 2) -> list[int]:
    """Triangulate a polygon (flat coords + hole start indices) →
    flat triangle vertex indices."""
    hole_indices = hole_indices or []
    has_holes = len(hole_indices) > 0
    outer_len = hole_indices[0] * dim if has_holes else len(data)
    outer_node = _linked_list(data, 0, outer_len, dim, True)
    triangles: list[int] = []

    if not outer_node or outer_node.next is outer_node.prev:
        return triangles

    min_x = min_y = inv_size = None

    if has_holes:
        outer_node = _eliminate_holes(data, hole_indices, outer_node, dim)

    # use z-order curve hashing for big polygons
    if len(data) > 80 * dim:
        xs = data[0:outer_len:dim]
        ys = data[1:outer_len:dim]
        min_x, max_x = min(xs), max(xs)
        min_y, max_y = min(ys), max(ys)
        inv_size = max(max_x - min_x, max_y - min_y)
        inv_size = 32767.0 / inv_size if inv_size != 0 else 0.0

    _earcut_linked(outer_node, triangles, dim, min_x, min_y, inv_size, 0)
    return triangles


def _linked_list(data, start, end, dim, clockwise):
    last = None
    if clockwise == (_signed_area(data, start, end, dim) > 0):
        for i in range(start, end, dim):
            last = _insert_node(i, data[i], data[i + 1], last)
    else:
        for i in range(end - dim, start - dim, -dim):
            last = _insert_node(i, data[i], data[i + 1], last)
    if last and _equals(last, last.next):
        _remove_node(last)
        last = last.next
    return last


def _signed_area(data, start, end, dim):
    s = 0.0
    j = end - dim
    for i in range(start, end, dim):
        s += (data[j] - data[i]) * (data[i + 1] + data[j + 1])
        j = i
    return s


def _insert_node(i, x, y, last):
    p = _Node(i, x, y)
    if last is None:
        p.prev = p
        p.next = p
    else:
        p.next = last.next
        p.prev = last
        last.next.prev = p
        last.next = p
    return p


def _remove_node(p):
    p.next.prev = p.prev
    p.prev.next = p.next
    if p.prevZ:
        p.prevZ.nextZ = p.nextZ
    if p.nextZ:
        p.nextZ.prevZ = p.prevZ


def _filter_points(start, end=None):
    if not start:
        return start
    if not end:
        end = start
    p = start
    while True:
        again = False
        if not p.steiner and (_equals(p, p.next) or _area(p.prev, p, p.next) == 0):
            _remove_node(p)
            p = end = p.prev
            if p is p.next:
                break
            again = True
        else:
            p = p.next
        if not (again or p is not end):
            break
    return end


def _earcut_linked(ear, triangles, dim, min_x, min_y, inv_size, pass_):
    if not ear:
        return
    if not pass_ and inv_size:
        _index_curve(ear, min_x, min_y, inv_size)

    stop = ear
    while ear.prev is not ear.next:
        prev = ear.prev
        nxt = ear.next
        if (_is_ear_hashed(ear, min_x, min_y, inv_size) if inv_size else _is_ear(ear)):
            triangles.append(prev.i // dim)
            triangles.append(ear.i // dim)
            triangles.append(nxt.i // dim)
            _remove_node(ear)
            ear = nxt.next
            stop = nxt.next
            continue
        ear = nxt
        if ear is stop:
            if not pass_:
                _earcut_linked(_filter_points(ear), triangles, dim, min_x, min_y, inv_size, 1)
            elif pass_ == 1:
                ear = _cure_local_intersections(_filter_points(ear), triangles, dim)
                _earcut_linked(ear, triangles, dim, min_x, min_y, inv_size, 2)
            elif pass_ == 2:
                _split_earcut(ear, triangles, dim, min_x, min_y, inv_size)
            break


def _is_ear(ear):
    # hot loop: _area/_point_in_triangle inlined (identical arithmetic
    # and evaluation order — byte-equal cells, just fewer frames)
    a, b, c = ear.prev, ear, ear.next
    ax, ay, bx, by, cx, cy = a.x, a.y, b.x, b.y, c.x, c.y
    if (by - ay) * (cx - bx) - (bx - ax) * (cy - by) >= 0:
        return False  # reflex
    p = c.next
    stop = a
    while p is not stop:
        px = p.x
        py = p.y
        if (
            (cx - px) * (ay - py) >= (ax - px) * (cy - py)
            and (ax - px) * (by - py) >= (bx - px) * (ay - py)
            and (bx - px) * (cy - py) >= (cx - px) * (by - py)
        ):
            pp = p.prev
            pn = p.next
            if (py - pp.y) * (pn.x - px) - (px - pp.x) * (pn.y - py) >= 0:
                return False
        p = p.next
    return True


def _is_ear_hashed(ear, min_x, min_y, inv_size):
    a, b, c = ear.prev, ear, ear.next
    if _area(a, b, c) >= 0:
        return False
    min_tx = min(a.x, b.x, c.x)
    min_ty = min(a.y, b.y, c.y)
    max_tx = max(a.x, b.x, c.x)
    max_ty = max(a.y, b.y, c.y)
    min_z = _z_order(min_tx, min_ty, min_x, min_y, inv_size)
    max_z = _z_order(max_tx, max_ty, min_x, min_y, inv_size)

    p = ear.prevZ
    n = ear.nextZ
    while p and p.z >= min_z and n and n.z <= max_z:
        if (
            p is not ear.prev and p is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
            and _area(p.prev, p, p.next) >= 0
        ):
            return False
        p = p.prevZ
        if (
            n is not ear.prev and n is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, n.x, n.y)
            and _area(n.prev, n, n.next) >= 0
        ):
            return False
        n = n.nextZ
    while p and p.z >= min_z:
        if (
            p is not ear.prev and p is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
            and _area(p.prev, p, p.next) >= 0
        ):
            return False
        p = p.prevZ
    while n and n.z <= max_z:
        if (
            n is not ear.prev and n is not ear.next
            and _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, n.x, n.y)
            and _area(n.prev, n, n.next) >= 0
        ):
            return False
        n = n.nextZ
    return True


def _cure_local_intersections(start, triangles, dim):
    p = start
    while True:
        a = p.prev
        b = p.next.next
        if (
            not _equals(a, b)
            and _intersects(a, p, p.next, b)
            and _locally_inside(a, b)
            and _locally_inside(b, a)
        ):
            triangles.append(a.i // dim)
            triangles.append(p.i // dim)
            triangles.append(b.i // dim)
            _remove_node(p)
            _remove_node(p.next)
            p = start = b
        p = p.next
        if p is start:
            break
    return _filter_points(p)


def _split_earcut(start, triangles, dim, min_x, min_y, inv_size):
    a = start
    while True:
        b = a.next.next
        while b is not a.prev:
            if a.i != b.i and _is_valid_diagonal(a, b):
                c = _split_polygon(a, b)
                a = _filter_points(a, a.next)
                c = _filter_points(c, c.next)
                _earcut_linked(a, triangles, dim, min_x, min_y, inv_size, 0)
                _earcut_linked(c, triangles, dim, min_x, min_y, inv_size, 0)
                return
            b = b.next
        a = a.next
        if a is start:
            break


def _eliminate_holes(data, hole_indices, outer_node, dim):
    queue = []
    for i, hi in enumerate(hole_indices):
        start = hi * dim
        end = hole_indices[i + 1] * dim if i < len(hole_indices) - 1 else len(data)
        lst = _linked_list(data, start, end, dim, False)
        if lst is lst.next:
            lst.steiner = True
        queue.append(_get_leftmost(lst))
    queue.sort(key=lambda p: (p.x, p.y))
    for q in queue:
        outer_node = _eliminate_hole(q, outer_node)
    return outer_node


def _eliminate_hole(hole, outer_node):
    bridge = _find_hole_bridge(hole, outer_node)
    if not bridge:
        return outer_node
    bridge_reverse = _split_polygon(bridge, hole)
    _filter_points(bridge_reverse, bridge_reverse.next)
    return _filter_points(bridge, bridge.next)


def _find_hole_bridge(hole, outer_node):
    p = outer_node
    hx = hole.x
    hy = hole.y
    qx = -math.inf
    m = None
    # find a segment intersected by a ray from the hole's leftmost point
    # to the left; segment's right endpoint becomes the candidate
    while True:
        if p.y >= hy >= p.next.y and p.next.y != p.y:
            x = p.x + (hy - p.y) * (p.next.x - p.x) / (p.next.y - p.y)
            if hx >= x > qx:
                qx = x
                m = p if p.x < p.next.x else p.next
                if x == hx:
                    return m  # hole touches outer segment (vertex)
        p = p.next
        if p is outer_node:
            break
    if not m:
        return None

    stop = m
    mx = m.x
    my = m.y
    tan_min = math.inf
    p = m
    while True:
        if (
            hx >= p.x >= mx
            and hx != p.x
            and _point_in_triangle(
                hx if hy < my else qx, hy, mx, my, qx if hy < my else hx, hy, p.x, p.y
            )
        ):
            tan = abs(hy - p.y) / (hx - p.x)
            if _locally_inside(p, hole) and (
                tan < tan_min
                or (tan == tan_min and (p.x > m.x or (p.x == m.x and _sector_contains_sector(m, p))))
            ):
                m = p
                tan_min = tan
        p = p.next
        if p is stop:
            break
    return m


def _sector_contains_sector(m, p):
    return _area(m.prev, m, p.prev) < 0 and _area(p.next, m, m.next) < 0


def _index_curve(start, min_x, min_y, inv_size):
    p = start
    while True:
        if p.z == 0:
            p.z = _z_order(p.x, p.y, min_x, min_y, inv_size)
        p.prevZ = p.prev
        p.nextZ = p.next
        p = p.next
        if p is start:
            break
    p.prevZ.nextZ = None
    p.prevZ = None
    _sort_linked(p)


def _sort_linked(head):
    in_size = 1
    while True:
        p = head
        head = None
        tail = None
        num_merges = 0
        while p:
            num_merges += 1
            q = p
            p_size = 0
            for _ in range(in_size):
                p_size += 1
                q = q.nextZ
                if not q:
                    break
            q_size = in_size
            while p_size > 0 or (q_size > 0 and q):
                if p_size != 0 and (q_size == 0 or not q or p.z <= q.z):
                    e = p
                    p = p.nextZ
                    p_size -= 1
                else:
                    e = q
                    q = q.nextZ
                    q_size -= 1
                if tail:
                    tail.nextZ = e
                else:
                    head = e
                e.prevZ = tail
                tail = e
            p = q
        tail.nextZ = None
        in_size *= 2
        if num_merges <= 1:
            break
    return head


def _z_order(x, y, min_x, min_y, inv_size):
    x = int((x - min_x) * inv_size)
    y = int((y - min_y) * inv_size)
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    y = (y | (y << 8)) & 0x00FF00FF
    y = (y | (y << 4)) & 0x0F0F0F0F
    y = (y | (y << 2)) & 0x33333333
    y = (y | (y << 1)) & 0x55555555
    return x | (y << 1)


def _get_leftmost(start):
    p = start
    leftmost = start
    while True:
        if p.x < leftmost.x or (p.x == leftmost.x and p.y < leftmost.y):
            leftmost = p
        p = p.next
        if p is start:
            break
    return leftmost


def _point_in_triangle(ax, ay, bx, by, cx, cy, px, py):
    return (
        (cx - px) * (ay - py) >= (ax - px) * (cy - py)
        and (ax - px) * (by - py) >= (bx - px) * (ay - py)
        and (bx - px) * (cy - py) >= (cx - px) * (by - py)
    )


def _is_valid_diagonal(a, b):
    return (
        a.next.i != b.i
        and a.prev.i != b.i
        and not _intersects_polygon(a, b)
        and (
            _locally_inside(a, b)
            and _locally_inside(b, a)
            and _middle_inside(a, b)
            and (_area(a.prev, a, b.prev) or _area(a, b.prev, b))
            or _equals(a, b)
            and _area(a.prev, a, a.next) > 0
            and _area(b.prev, b, b.next) > 0
        )
    )


def _area(p, q, r):
    return (q.y - p.y) * (r.x - q.x) - (q.x - p.x) * (r.y - q.y)


def _equals(p1, p2):
    return p1.x == p2.x and p1.y == p2.y


def _sign(num):
    return (num > 0) - (num < 0)


def _on_segment(p, q, r):
    return max(p.x, r.x) >= q.x >= min(p.x, r.x) and max(p.y, r.y) >= q.y >= min(p.y, r.y)


def _intersects(p1, q1, p2, q2):
    # hot path of the split/cure fallback passes: _area/_sign inlined
    # (identical arithmetic and short-circuit order — same results,
    # ~4x fewer Python frames per call)
    p1x = p1.x
    p1y = p1.y
    q1x = q1.x
    q1y = q1.y
    p2x = p2.x
    p2y = p2.y
    q2x = q2.x
    q2y = q2.y
    a1 = (q1y - p1y) * (p2x - q1x) - (q1x - p1x) * (p2y - q1y)
    a2 = (q1y - p1y) * (q2x - q1x) - (q1x - p1x) * (q2y - q1y)
    a3 = (q2y - p2y) * (p1x - q2x) - (q2x - p2x) * (p1y - q2y)
    a4 = (q2y - p2y) * (q1x - q2x) - (q2x - p2x) * (q1y - q2y)
    o1 = (a1 > 0) - (a1 < 0)
    o2 = (a2 > 0) - (a2 < 0)
    o3 = (a3 > 0) - (a3 < 0)
    o4 = (a4 > 0) - (a4 < 0)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_segment(p1, p2, q1):
        return True
    if o2 == 0 and _on_segment(p1, q2, q1):
        return True
    if o3 == 0 and _on_segment(p2, p1, q2):
        return True
    if o4 == 0 and _on_segment(p2, q1, q2):
        return True
    return False


def _intersects_polygon(a, b):
    ai = a.i
    bi = b.i
    p = a
    while True:
        pn = p.next
        if (
            p.i != ai
            and pn.i != ai
            and p.i != bi
            and pn.i != bi
            and _intersects(p, pn, a, b)
        ):
            return True
        p = pn
        if p is a:
            break
    return False


def _locally_inside(a, b):
    if _area(a.prev, a, a.next) < 0:
        return _area(a, b, a.next) >= 0 and _area(a, a.prev, b) >= 0
    return _area(a, b, a.prev) < 0 or _area(a, a.next, b) < 0


def _middle_inside(a, b):
    p = a
    inside = False
    px = (a.x + b.x) / 2
    py = (a.y + b.y) / 2
    while True:
        if ((p.y > py) != (p.next.y > py)) and p.next.y != p.y and (
            px < (p.next.x - p.x) * (py - p.y) / (p.next.y - p.y) + p.x
        ):
            inside = not inside
        p = p.next
        if p is a:
            break
    return inside


def _split_polygon(a, b):
    a2 = _Node(a.i, a.x, a.y)
    b2 = _Node(b.i, b.x, b.y)
    an = a.next
    bp = b.prev
    a.next = b
    b.prev = a
    a2.next = an
    an.prev = a2
    b2.next = a2
    a2.prev = b2
    bp.next = b2
    b2.prev = bp
    return b2


# --------------------------------------------------------------------------
# vectorized kernels (numpy, f32 where the reference narrows to f32)
# --------------------------------------------------------------------------


def bbox_reduceat(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-list min/max over interleaved lon,lat f32 positions.

    values: flat [x0,y0,x1,y1,...] float32; offsets: int offsets into
    *pairs* (list boundaries, len = n_lists+1). Returns (n,4) float32
    [minx,miny,maxx,maxy] — semantics of the reference's bbox folds
    (/root/reference/src/lib.rs:228-235).
    """
    xs = values[0::2]
    ys = values[1::2]
    starts = offsets[:-1]
    empty = starts == offsets[1:]
    # reduceat needs non-empty segments; guard with clip then mask
    idx = np.minimum(starts, len(xs) - 1) if len(xs) else starts
    out = np.empty((len(starts), 4), dtype=np.float32)
    if len(xs) == 0 or len(starts) == 0:
        out[:] = np.nan
        return out
    out[:, 0] = np.minimum.reduceat(xs, idx)
    out[:, 1] = np.minimum.reduceat(ys, idx)
    out[:, 2] = np.maximum.reduceat(xs, idx)
    out[:, 3] = np.maximum.reduceat(ys, idx)
    out[empty] = np.nan
    return out


def overlap_area(
    bbox: tuple[float, float, float, float],
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    is_point: np.ndarray,
) -> np.ndarray:
    """Vectorized /root/reference/src/divide.rs:74-92 in float32.

    Scalar (point) features score 1.0 when inside the box (inclusive
    edges), else 0.0. Interval (bbox) features score the clipped
    intersection area (can be 0 on exact edge contact, matching the
    reference's ``x * y`` product).
    """
    f32 = np.float32
    bx0, by0, bx1, by1 = (f32(bbox[0]), f32(bbox[1]), f32(bbox[2]), f32(bbox[3]))
    minx = minx.astype(f32, copy=False)
    miny = miny.astype(f32, copy=False)
    maxx = maxx.astype(f32, copy=False)
    maxy = maxy.astype(f32, copy=False)

    pt_in = (bx0 <= minx) & (minx <= bx1) & (by0 <= miny) & (miny <= by1)
    disjoint = (bx0 > maxx) | (bx1 < minx) | (by0 > maxy) | (by1 < miny)
    x = np.minimum(maxx, bx1) - np.maximum(minx, bx0)
    y = np.minimum(maxy, by1) - np.maximum(miny, by0)
    area = (x * y).astype(f32)
    area = np.where(disjoint, f32(0.0), area)
    return np.where(is_point, np.where(pt_in, f32(1.0), f32(0.0)), area)


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    ring_values: np.ndarray,
    ring_offsets: np.ndarray,
) -> np.ndarray:
    """Even-odd ray-casting PIP over a packed-ring polygon.

    ``ring_values`` is interleaved lon,lat (flat f32/f64);
    ``ring_offsets`` are *pair* offsets delimiting rings (outer +
    holes; even-odd rule makes holes subtract). Vectorized over all
    query points per edge (numpy broadcast) — O(edges) passes over the
    point array, no Python per-point loop.
    """
    inside = np.zeros(len(px), dtype=bool)
    xs = ring_values[0::2]
    ys = ring_values[1::2]
    for r in range(len(ring_offsets) - 1):
        s, e = int(ring_offsets[r]), int(ring_offsets[r + 1])
        if e - s < 3:
            continue
        rx = xs[s:e]
        ry = ys[s:e]
        x1 = rx
        y1 = ry
        x2 = np.roll(rx, -1)
        y2 = np.roll(ry, -1)
        for k in range(len(rx)):
            ax, ay, bx, by = x1[k], y1[k], x2[k], y2[k]
            if ay == by:
                continue
            cond = (py < ay) != (py < by)
            t = (py - ay) / (by - ay)
            crossx = ax + t * (bx - ax)
            inside ^= cond & (px < crossx)
    return inside


def segment_lengths(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-list element counts from Arrow offsets."""
    return np.diff(offsets)
