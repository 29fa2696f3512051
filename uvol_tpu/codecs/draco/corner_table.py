"""Corner table — the mesh connectivity structure behind Edgebreaker coding.

Corners are integers; corner c belongs to face c // 3. `next`/`previous`
cycle within a face; `opposite` links the two corners facing a shared edge.
Orientation invariant used throughout the Draco-format codecs:

    vertex(next(c)) == vertex(previous(opposite(c)))
    vertex(previous(c)) == vertex(next(opposite(c)))

Also provides the seam-cut variant (`MeshAttributeCornerTable`) used by
corner-mapped attributes (UVs/normals with seams), mirroring the role of
Draco's MeshAttributeCornerTable for the reference's UV/normal channels.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

INVALID = -1


def next_corner(c: int) -> int:
    return c - 2 if c % 3 == 2 else c + 1


def previous_corner(c: int) -> int:
    return c + 2 if c % 3 == 0 else c - 1


class CornerTable:
    """Growable corner table used during Edgebreaker decode."""

    def __init__(self, num_faces: int, max_num_vertices: int):
        n = num_faces * 3
        self.opposite = np.full(n, INVALID, np.int32)
        self.vertex = np.full(n, INVALID, np.int32)
        # one representative corner per vertex (any corner mapped to it)
        self.vertex_corner = np.full(max_num_vertices, INVALID, np.int32)
        self.num_vertices = 0

    # -- topology ------------------------------------------------------------
    def set_opposite(self, a: int, b: int) -> None:
        self.opposite[a] = b
        self.opposite[b] = a

    def map_corner_to_vertex(self, corner: int, vert: int) -> None:
        self.vertex[corner] = vert
        self.vertex_corner[vert] = corner

    def new_vertex(self) -> int:
        v = self.num_vertices
        self.num_vertices += 1
        return v

    def swing_left(self, c: int) -> int:
        """CCW to the next corner around vertex(c); INVALID at a boundary."""
        o = self.opposite[next_corner(c)]
        return INVALID if o == INVALID else next_corner(o)

    def swing_right(self, c: int) -> int:
        o = self.opposite[previous_corner(c)]
        return INVALID if o == INVALID else previous_corner(o)

    def left_most_corner(self, vert: int) -> int:
        """Walk CCW from the representative corner to the boundary (or any
        corner if the fan is closed)."""
        c = int(self.vertex_corner[vert])
        start = c
        while True:
            n = self.swing_left(c)
            if n == INVALID or n == start:
                return c
            c = n

    def corners_around_vertex(self, vert: int) -> List[int]:
        """All corners currently mapped to `vert` (walk both directions)."""
        start = int(self.vertex_corner[vert])
        out = [start]
        c = start
        while True:
            c = self.swing_left(c)
            if c == INVALID or c == start:
                break
            out.append(c)
        if c != start:  # open fan: also walk right
            c = start
            while True:
                c = self.swing_right(c)
                if c == INVALID:
                    break
                out.append(c)
        return out

    @property
    def num_corners(self) -> int:
        return len(self.vertex)

    def faces(self) -> np.ndarray:
        return self.vertex.reshape(-1, 3)


class MeshAttributeCornerTable:
    """Attribute connectivity: the corner fan around each vertex is cut at
    seam edges, splitting one position-vertex into several attribute
    vertices (e.g. UV seams). Assigns an attribute-vertex id to each corner.
    """

    def __init__(self, ct: CornerTable, seam_corners: np.ndarray):
        """`seam_corners`: corners whose *opposite edge* is a seam."""
        self.ct = ct
        n = ct.num_corners
        self.is_edge_on_seam = np.zeros(n, bool)
        for c in np.asarray(seam_corners, np.int64):
            self.is_edge_on_seam[c] = True
            o = ct.opposite[c]
            if o != INVALID:
                self.is_edge_on_seam[o] = True
        self.corner_to_vertex = np.full(n, INVALID, np.int32)
        self.vertex_to_corner: List[int] = []  # attribute vertex -> one corner
        self.vertex_parent: List[int] = []  # attribute vertex -> position vertex
        self._recompute()

    # seam-aware swings: cannot cross a seam edge
    def swing_left(self, c: int) -> int:
        nc = next_corner(c)
        if self.is_edge_on_seam[nc]:
            return INVALID
        o = self.ct.opposite[nc]
        return INVALID if o == INVALID else next_corner(o)

    def swing_right(self, c: int) -> int:
        pc = previous_corner(c)
        if self.is_edge_on_seam[pc]:
            return INVALID
        o = self.ct.opposite[pc]
        return INVALID if o == INVALID else previous_corner(o)

    def _recompute(self) -> None:
        """Group corners into attribute vertices: maximal seam-free fans.

        Mirrors Draco's RecomputeVertices: for every position vertex, start
        from the right-most corner of each seam-separated fan and sweep left,
        assigning one attribute vertex per fan. Deterministic order: corners
        are processed per position-vertex in increasing vertex id, and fans
        in sweep order starting from the right-most corner.
        """
        ct = self.ct
        for vert in range(ct.num_vertices):
            c0 = ct.vertex_corner[vert]
            if c0 == INVALID:
                continue
            # find right-most corner (stop if we loop without hitting a seam)
            c = int(c0)
            start = c
            is_closed = False
            while True:
                r = self.swing_right(c)
                if r == INVALID:
                    break
                if r == start:
                    is_closed = True
                    break
                c = r
            first_fan_corner = c
            # sweep left assigning fans
            fan_vertex = INVALID
            c = first_fan_corner
            while True:
                if self.corner_to_vertex[c] != INVALID:
                    break  # done (closed loop)
                if fan_vertex == INVALID or self._crossed_seam_from_right(c):
                    fan_vertex = len(self.vertex_to_corner)
                    self.vertex_to_corner.append(c)
                    self.vertex_parent.append(vert)
                self.corner_to_vertex[c] = fan_vertex
                nxt = self.swing_left(c)
                if nxt == INVALID:
                    if is_closed and not self.is_edge_on_seam[next_corner(c)]:
                        pass
                    # try continuing at the next unassigned fan of this vertex
                    nxt = self._next_unassigned_corner(vert)
                    fan_vertex = INVALID
                    if nxt == INVALID:
                        break
                c = nxt

    def _crossed_seam_from_right(self, c: int) -> bool:
        return False  # fan breaks are handled by swing_left returning INVALID

    def _next_unassigned_corner(self, vert: int) -> int:
        for c in self.ct.corners_around_vertex(vert):
            if self.corner_to_vertex[c] == INVALID:
                # rewind to the right-most unassigned corner of this fan
                while True:
                    r = self.swing_right(c)
                    if r == INVALID or self.corner_to_vertex[r] != INVALID:
                        return c
                    c = r
        return INVALID

    @property
    def num_vertices(self) -> int:
        return len(self.vertex_to_corner)
