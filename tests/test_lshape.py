import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mamri_tpu.core import transforms as T
from mamri_tpu.core.robot import load_robot_model, marker_world_positions
from mamri_tpu.registration.lshape import (
    match_l_shaped_triplets,
    match_l_shaped_triplets_global,
    order_l_shape,
)

K = 32
TOL = 5.0


def _pad(points):
    pts = np.zeros((K, 3), dtype=np.float32)
    valid = np.zeros(K, dtype=bool)
    pts[: len(points)] = points
    valid[: len(points)] = True
    return jnp.asarray(pts), jnp.asarray(valid)


def _l_triplet(l1, l2, transform=np.eye(4)):
    """corner at origin, short arm +y (l2), long arm +x (l1) in local frame."""
    local = np.array([[0.0, 0.0, 0.0], [0.0, l2, 0.0], [l1, 0.0, 0.0]], dtype=np.float32)
    return np.asarray(T.apply(jnp.asarray(transform.astype(np.float32)), jnp.asarray(local)))


def _oracle(points, arm_lengths, tol=TOL):
    """Sequential greedy matcher with the reference's semantics
    (first lexicographic combo wins, blob ids consumed across links)."""
    used = set()
    result = []
    n = len(points)
    for l1, l2 in arm_lengths:
        expected = sorted([l1, l2, math.hypot(l1, l2)])
        match = None
        for combo in itertools.combinations(range(n), 3):
            if any(c in used for c in combo):
                continue
            p = [points[c] for c in combo]
            d = sorted(
                [
                    np.linalg.norm(p[0] - p[1]),
                    np.linalg.norm(p[0] - p[2]),
                    np.linalg.norm(p[1] - p[2]),
                ]
            )
            if all(abs(a - b) <= tol for a, b in zip(d, expected)):
                match = combo
                break
        if match is not None:
            used.update(match)
        result.append(match)
    return result


def test_single_triplet_found_and_ordered():
    tri = _l_triplet(40.0, 20.0)
    pts, valid = _pad(tri)
    m = match_l_shaped_triplets(pts, valid, [(40.0, 20.0)])
    assert bool(m.found[0])
    got = np.asarray(m.points[0])
    # corner first, then short-arm end (20), then long-arm end (40)
    np.testing.assert_allclose(got[0], tri[0], atol=1e-5)
    assert abs(np.linalg.norm(got[1] - got[0]) - 20.0) < 1e-3
    assert abs(np.linalg.norm(got[2] - got[0]) - 40.0) < 1e-3


def test_order_l_shape_fallback_when_degenerate():
    pts = jnp.asarray(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32))
    ordered, ok = order_l_shape(pts, 40.0, 20.0, 5.0)
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(ordered), np.asarray(pts))


def test_parity_with_sequential_oracle():
    """Greedy consumption must match the reference's sequential scan exactly,
    including the ambiguity where Baseplate (40,20) and Joint6 (45,20)
    signatures overlap within the 5 mm tolerance."""
    model = load_robot_model()
    marker_links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    arms = [model.spec(ln).arm_lengths for ln in marker_links]
    base_tri = _l_triplet(40.0, 20.0)
    j6_tri = _l_triplet(45.0, 20.0, np.asarray(T.translate(jnp.array([200.0, 0.0, 0.0]))))
    j2_tri = _l_triplet(70.0, 25.0, np.asarray(T.translate(jnp.array([0.0, 200.0, 0.0]))))
    j4_tri = _l_triplet(70.0, 20.0, np.asarray(T.translate(jnp.array([0.0, -200.0, 0.0]))))
    all_pts = np.concatenate([j6_tri, base_tri, j2_tri, j4_tri])
    pts, valid = _pad(all_pts)
    m = match_l_shaped_triplets(pts, valid, arms, strict_reference_order=True)
    want = _oracle(all_pts, arms)
    for li in range(len(arms)):
        if want[li] is None:
            assert not bool(m.found[li])
        else:
            assert bool(m.found[li])
            assert set(np.asarray(m.member_ids[li]).tolist()) == set(want[li]), (li, want[li])


def test_parity_with_oracle_randomized():
    model = load_robot_model()
    marker_links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    arms = [model.spec(ln).arm_lengths for ln in marker_links]
    rng = np.random.default_rng(7)
    for trial in range(5):
        tris = [
            _l_triplet(a[0], a[1], np.asarray(T.translate(jnp.asarray(rng.uniform(-150, 150, 3).astype(np.float32)))))
            for a in arms
        ]
        noise = rng.uniform(-120, 120, size=(4, 3)).astype(np.float32)  # stray blobs
        all_pts = np.concatenate(tris + [noise])
        perm = rng.permutation(len(all_pts))
        all_pts = all_pts[perm]
        pts, valid = _pad(all_pts)
        m = match_l_shaped_triplets(pts, valid, arms, strict_reference_order=True)
        want = _oracle(all_pts, arms)
        for li in range(len(arms)):
            if want[li] is None:
                assert not bool(m.found[li]), (trial, li)
            else:
                assert set(np.asarray(m.member_ids[li]).tolist()) == set(want[li]), (trial, li)


def test_no_match_with_wrong_geometry():
    tri = _l_triplet(100.0, 60.0)
    pts, valid = _pad(tri)
    m = match_l_shaped_triplets(pts, valid, [(40.0, 20.0)])
    assert not bool(m.found[0])
    assert np.all(np.asarray(m.member_ids[0]) == -1)


def test_matches_fk_generated_markers():
    """Default best-match mode: every marker link recovers exactly ITS OWN FK
    marker triplet despite permuted blob order and the pairwise-overlapping
    signatures (Baseplate~Joint6, Joint2~Joint4) that make the reference's
    first-match greedy order-dependent. (Exact reference parity at the 5.0 mm
    tolerance boundary is backend-ULP-sensitive and covered by the
    constructed-oracle tests above.)"""
    model = load_robot_model()
    angles = jnp.array([0.4, -0.3, 0.6, 0.9, -0.5, 0.7])
    base = np.asarray(T.translate(jnp.array([30.0, -40.0, 10.0])) @ T.rot_z(jnp.float32(0.3)))
    marker_links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    fk_pts = {ln: np.asarray(marker_world_positions(model, angles, ln, jnp.asarray(base))) for ln in marker_links}
    all_pts = np.concatenate([fk_pts[ln] for ln in marker_links])
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(all_pts))
    all_pts = all_pts[perm]
    pts, valid = _pad(all_pts)
    arms = [model.spec(ln).arm_lengths for ln in marker_links]
    m = jax.jit(lambda p, v: match_l_shaped_triplets(p, v, arms))(pts, valid)
    assert np.all(np.asarray(m.found)), np.asarray(m.found)
    for li, ln in enumerate(marker_links):
        got = np.asarray(m.points[li])
        for row in fk_pts[ln]:
            assert np.min(np.linalg.norm(got - row, axis=1)) < 1e-3, (ln, row)


def test_insufficient_blobs():
    pts, valid = _pad(np.array([[0.0, 0.0, 0.0], [40.0, 0.0, 0.0]]))
    m = match_l_shaped_triplets(pts, valid, [(40.0, 20.0)])
    assert not bool(m.found[0])


def test_best_match_resolves_baseplate_joint6_ambiguity():
    """Default (min-error) mode assigns each triplet to its true link even
    when the J6 triplet precedes the baseplate triplet in blob order —
    the case where the reference's first-match greedy mis-assigns."""
    model = load_robot_model()
    marker_links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    arms = [model.spec(ln).arm_lengths for ln in marker_links]
    j6_tri = _l_triplet(45.0, 20.0)  # FIRST in blob order
    base_tri = _l_triplet(40.0, 20.0, np.asarray(T.translate(jnp.array([200.0, 0.0, 0.0]))))
    pts, valid = _pad(np.concatenate([j6_tri, base_tri]))
    m = match_l_shaped_triplets(pts, valid, arms)
    assert bool(m.found[0]) and bool(m.found[3])
    assert set(np.asarray(m.member_ids[0]).tolist()) == {3, 4, 5}  # baseplate gets its own
    assert set(np.asarray(m.member_ids[3]).tolist()) == {0, 1, 2}  # joint6 gets its own


# --------------------------------------------------------------- global mode
def _global_oracle(points, arm_lengths, tol=TOL):
    """Brute-force globally optimal assignment: maximize matched links, then
    minimize total signature error, triplets pairwise disjoint."""
    n = len(points)
    per_link = []
    for l1, l2 in arm_lengths:
        expected = sorted([l1, l2, math.hypot(l1, l2)])
        opts = []
        for combo in itertools.combinations(range(n), 3):
            p = [points[c] for c in combo]
            d = sorted(
                [
                    np.linalg.norm(p[0] - p[1]),
                    np.linalg.norm(p[0] - p[2]),
                    np.linalg.norm(p[1] - p[2]),
                ]
            )
            errs = [abs(a - b) for a, b in zip(d, expected)]
            if all(e <= tol for e in errs):
                opts.append((combo, sum(errs)))
        per_link.append(opts)

    best = (-1, float("inf"), None)  # (n_matched, total_err, assignment)

    def rec(li, used, matched, err, assign):
        nonlocal best
        if li == len(per_link):
            if matched > best[0] or (matched == best[0] and err < best[1]):
                best = (matched, err, list(assign))
            return
        rec(li + 1, used, matched, err, assign + [None])
        for combo, e in per_link[li]:
            if not (set(combo) & used):
                rec(li + 1, used | set(combo), matched + 1, err + e, assign + [combo])

    rec(0, set(), 0, 0.0, [])
    return best


def test_global_matches_fk_generated_markers():
    model = load_robot_model()
    angles = jnp.array([0.4, -0.3, 0.6, 0.9, -0.5, 0.7])
    base = np.asarray(T.translate(jnp.array([30.0, -40.0, 10.0])) @ T.rot_z(jnp.float32(0.3)))
    marker_links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    fk_pts = {ln: np.asarray(marker_world_positions(model, angles, ln, jnp.asarray(base))) for ln in marker_links}
    all_pts = np.concatenate([fk_pts[ln] for ln in marker_links])
    rng = np.random.default_rng(11)
    all_pts = all_pts[rng.permutation(len(all_pts))]
    pts, valid = _pad(all_pts)
    arms = [model.spec(ln).arm_lengths for ln in marker_links]
    m = jax.jit(lambda p, v: match_l_shaped_triplets_global(p, v, arms))(pts, valid)
    assert np.all(np.asarray(m.found))
    for li, ln in enumerate(marker_links):
        got = np.asarray(m.points[li])
        for row in fk_pts[ln]:
            assert np.min(np.linalg.norm(got - row, axis=1)) < 1e-3, (ln, row)


def test_global_does_not_steal_when_own_triplet_missing():
    """A missing link must not absorb a signature-overlapping link's triplet.
    Greedy (any order-based variant) hands link (40,20) the only triplet even
    though it belongs to link (43,20); global assignment prefers the zero-
    error owner at equal match count."""
    arms = [(40.0, 20.0), (43.0, 20.0)]
    tri = _l_triplet(43.0, 20.0)  # only the SECOND link's triplet exists
    pts, valid = _pad(tri)
    g = match_l_shaped_triplets(pts, valid, arms)  # greedy best-match: steals
    assert bool(g.found[0]) and not bool(g.found[1])
    m = match_l_shaped_triplets_global(pts, valid, arms)
    assert not bool(m.found[0])
    assert bool(m.found[1])
    assert set(np.asarray(m.member_ids[1]).tolist()) == {0, 1, 2}


def test_global_parity_with_bruteforce_oracle_dropout():
    """Randomized dropout property test: the jitted global matcher reaches the
    brute-force optimum (match count and total assignment) with links missing
    and stray blobs present."""
    model = load_robot_model()
    marker_links = ["Baseplate", "Joint2", "Joint4", "Joint6"]
    arms = [model.spec(ln).arm_lengths for ln in marker_links]
    rng = np.random.default_rng(23)
    for trial in range(8):
        present = rng.random(4) > 0.35
        tris = [
            _l_triplet(a[0], a[1], np.asarray(T.translate(jnp.asarray(rng.uniform(-150, 150, 3).astype(np.float32)))))
            for a, keep in zip(arms, present)
            if keep
        ]
        noise = rng.uniform(-120, 120, size=(3, 3)).astype(np.float32)
        all_pts = np.concatenate(tris + [noise]) if tris else noise
        all_pts = all_pts[rng.permutation(len(all_pts))]
        pts, valid = _pad(all_pts)
        m = match_l_shaped_triplets_global(pts, valid, arms)
        n_want, err_want, assign_want = _global_oracle(all_pts, arms)
        n_got = int(np.asarray(m.found).sum())
        assert n_got == n_want, (trial, n_got, n_want)
        # and the chosen sets must be a valid optimal assignment: recompute err
        err_got = 0.0
        used = set()
        for li, (l1, l2) in enumerate(arms):
            if not bool(m.found[li]):
                continue
            ids = set(np.asarray(m.member_ids[li]).tolist())
            assert not (ids & used), (trial, li)
            used |= ids
            p = [all_pts[i] for i in ids]
            d = sorted(
                [
                    np.linalg.norm(p[0] - p[1]),
                    np.linalg.norm(p[0] - p[2]),
                    np.linalg.norm(p[1] - p[2]),
                ]
            )
            expected = sorted([l1, l2, math.hypot(l1, l2)])
            errs = [abs(a - b) for a, b in zip(d, expected)]
            assert all(e <= TOL for e in errs), (trial, li)
            err_got += sum(errs)
        assert err_got <= err_want + 1e-3, (trial, err_got, err_want)
