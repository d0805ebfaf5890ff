"""Hierarchical reconstruction: partition -> per-cluster MVO -> tree merge.

Parity: /root/reference/gtsfm/scene_optimizer.py:180-338 (per-cluster
scheduling over the cluster tree + submit_tree_map_with_children merge) and
cluster_merging.combine_results (:694), with drop_child_if_merging_fail
semantics (cluster_optimizer_base.py:100).

The front-end (detection + two-view over ALL retrieved pairs, including
future cut edges) runs once as flat device batches; the cluster tree then
routes edge subsets into independent MVO back-ends, and the bottom-up fold
aligns children with Sim3 from cross-cluster 3D-3D track pairs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from gtsfm_tpu.common.sfm_data import SceneMeta, SfmData
from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.merging.merge import MergeOptions, merge_children
from gtsfm_tpu.partitioner.partitioners import MetisPartitioner
from gtsfm_tpu.products.types import ClusterTree
from gtsfm_tpu.scene.mvo import MVOOptions, MultiViewOptimizer
from gtsfm_tpu.utils.logger import get_logger

logger = get_logger("hierarchical")


def _expand_leaf_to_global(data_l, lc_pad, lc_full, cal_global, num_images: int):
    """Scatter a leaf's local-index reconstruction into the global camera
    space as ONE jitted dispatch (the eager scatter/gather chain cost
    ~10 s/leaf in tunnel round trips). lc_pad: i32[n_local] local->global,
    padding entries >= num_images (dropped by scatter mode). lc_full:
    i32[n_local] same map with padding clamped to a real camera (gather
    source for measurement remap; padded measurements are mask-False)."""
    import jax
    import jax.numpy as jnp

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def go(Rl, tl, pml, call, calg, meas_cam_l, lcp, lcf, n):
        poses_g = SE3.identity((n,))
        R = poses_g.R.at[lcp].set(Rl, mode="drop")
        t = poses_g.t.at[lcp].set(tl, mode="drop")
        pm = jnp.zeros(n, bool).at[lcp].set(pml, mode="drop")
        calo = jax.tree.map(
            lambda g, l: jnp.asarray(g).at[lcp].set(l, mode="drop"), calg, call
        )
        meas_cam_g = lcf[meas_cam_l]
        return R, t, pm, calo, meas_cam_g

    return go(
        data_l.poses.R, data_l.poses.t, data_l.pose_mask, data_l.cal,
        cal_global, data_l.meas_cam, lc_pad, lc_full, num_images,
    )


class HierarchicalOptions(NamedTuple):
    mvo: MVOOptions = MVOOptions()
    merge: MergeOptions = MergeOptions()
    max_depth: int = 3
    max_cluster_size: int = 40
    drop_child_if_merging_fail: bool = True


class HierarchicalReconstruction:
    """Runs the partitioned back-end given flat front-end outputs."""

    def __init__(self, options: HierarchicalOptions = HierarchicalOptions(), mesh=None,
                 cluster_cache=None):
        """cluster_cache: optional utils.cache.DiskCache — whole-cluster
        result caching (cluster_optimizer_cacher.py parity): a re-run with
        identical front-end outputs replays each leaf reconstruction."""
        self.options = options
        self.mesh = mesh
        self.cluster_cache = cluster_cache
        self.node_results = []  # [(path tuple, SfmData)] from the last run

    def run(
        self,
        num_images: int,
        pairs: np.ndarray,
        tvr: dict,  # flat two-view outputs (scene_optimizer._run_two_view)
        keypoints_xy: np.ndarray,
        cal,
        meta: Optional[SceneMeta] = None,
    ) -> tuple:
        opts = self.options
        valid = np.asarray(tvr["valid"], bool)
        edges = np.asarray(pairs, np.int64)
        # native multilevel (METIS-class) bisection; falls back to the
        # spectral splitter when libmetis_lite.so is unavailable
        part = MetisPartitioner(
            max_depth=opts.max_depth, max_cluster_size=opts.max_cluster_size
        )
        tree = part.run(edges[valid], edge_weights=np.asarray(tvr["num_inliers"])[valid])
        metrics = {"num_clusters": len(tree.leaves()), "tree_nodes": tree.num_nodes()}

        # map canonical edge -> flat index for routing subsets
        eindex = {(int(a), int(b)): e for e, (a, b) in enumerate(edges)}

        def edge_subset(sub_edges: np.ndarray) -> np.ndarray:
            return np.array([eindex[(int(a), int(b))] for a, b in sub_edges], np.int64)

        mvo = MultiViewOptimizer(opts.mvo, mesh=self.mesh)
        cluster_metrics = []

        # uniform leaf buckets + shared pad high-water marks: every leaf
        # runs at the SAME (cameras, edges) bucket, and the data-dependent
        # track/measurement buckets only ever grow (largest leaf runs
        # first), so the whole leaf fleet shares one traced executable set
        # per stage. Without this each leaf hit its own bucket combo and
        # paid a full jit retrace (~50 s/leaf on palace-281, remote TPU).
        self._pad_hwm = {}
        leaf_nodes = [nd for nd in _iter_nodes(tree) if nd.is_leaf and len(nd.value)]
        if leaf_nodes:
            from gtsfm_tpu.utils.numerics import ceil_pow2 as _cp2

            self._pad_hwm["leaf_edges"] = max(
                _cp2(len(nd.value), 8) for nd in leaf_nodes
            )
            self._pad_hwm["leaf_cams"] = max(
                _cp2(len(np.unique(edges[edge_subset(nd.value)])), 8)
                for nd in leaf_nodes
            )

        def run_leaf(node: ClusterTree):
            """Run MVO on a COMPACTED cluster: cameras remapped to a dense
            pow2-bucketed local index space, edges padded to a pow2 bucket.
            Per-cluster compute then scales with cluster size (not scene
            size) and XLA executables are shared between the many clusters
            of a large scene instead of recompiling per leaf."""
            import jax
            import jax.numpy as jnp

            from gtsfm_tpu.utils.numerics import ceil_pow2

            import time as _t

            t_prep0 = _t.perf_counter()
            sel = edge_subset(node.value)
            sub_edges = edges[sel]
            local_cams = np.unique(sub_edges)

            cache_key = None
            if self.cluster_cache is not None:
                from gtsfm_tpu.utils.cache import content_key

                stride = max(1, keypoints_xy.shape[1] // 32)
                cache_key = content_key(
                    sub_edges,
                    np.asarray(tvr["i2Ri1"])[sel],
                    np.asarray(tvr["i2Ui1"])[sel],
                    np.asarray(tvr["corr_mask"])[sel],
                    np.asarray(keypoints_xy)[local_cams][:, ::stride],
                    repr(opts.mvo),
                )
                hit = self.cluster_cache.get(cache_key)
                if hit is not None:
                    data_np, kp_map, m_cached = hit
                    cluster_metrics.append(dict(m_cached, cache_hit=True))
                    return (jax.tree.map(jnp.asarray, data_np), kp_map)
            n_local = max(ceil_pow2(len(local_cams), 8),
                          self._pad_hwm.get("leaf_cams", 0))
            g2l = np.full(num_images, -1, np.int64)
            g2l[local_cams] = np.arange(len(local_cams))
            E_raw = len(sel)
            E_pad = max(ceil_pow2(E_raw, 8), self._pad_hwm.get("leaf_edges", 0))
            padE = E_pad - E_raw

            def _pad(a, fill=0):
                out = np.full((padE,) + a.shape[1:], fill, a.dtype)
                return np.concatenate([a, out])

            pairs_l = _pad(g2l[sub_edges])
            pairs_l[E_raw:] = [0, 1]  # in-range dummy, pair_valid False
            R_l = _pad(np.asarray(tvr["i2Ri1"])[sel])
            R_l[E_raw:] = np.eye(3, dtype=R_l.dtype)
            U_l = _pad(np.asarray(tvr["i2Ui1"])[sel])
            U_l[E_raw:] = [0.0, 0.0, 1.0]
            # local camera-indexed inputs, padded rows harmless (no edges)
            cam_pad_idx = np.concatenate([
                local_cams,
                np.full(n_local - len(local_cams), local_cams[0], np.int64),
            ])
            kp_l = np.asarray(keypoints_xy)[cam_pad_idx]
            cal_l = jax.tree.map(lambda a: jnp.asarray(a)[jnp.asarray(cam_pad_idx)], cal)

            t_prep = _t.perf_counter() - t_prep0
            data_l, m = mvo.run(
                num_images=n_local,
                pairs=pairs_l,
                i2Ri1=R_l,
                i2Ui1=U_l,
                pair_valid=_pad(valid[sel]),
                num_inliers=_pad(np.asarray(tvr["num_inliers"])[sel]),
                corr_i1=_pad(np.asarray(tvr["corr_i1"])[sel]),
                corr_i2=_pad(np.asarray(tvr["corr_i2"])[sel]),
                corr_mask=_pad(np.asarray(tvr["corr_mask"])[sel]),
                keypoints_xy=kp_l,
                cal=cal_l,
                meta=None,
                pad_hwm=self._pad_hwm,
            )
            t_post0 = _t.perf_counter()
            cluster_metrics.append({k: v for k, v in m.items() if k != "aux"})
            logger.info(
                "  leaf mvo: prep=%.1fs %s",
                t_prep,
                " ".join(
                    f"{k[:-4]}={v:.1f}s" for k, v in m.items()
                    if k.endswith("_sec") and isinstance(v, float)
                ),
            )
            if m.get("failed"):
                return None
            # expand the local result back to the global camera space
            nl = len(local_cams)
            lc_pad = np.full(n_local, num_images, np.int64)  # OOB = dropped
            lc_pad[:nl] = local_cams
            lc_full = np.full(n_local, local_cams[0], np.int64)
            lc_full[:nl] = local_cams
            R_g, t_g, pose_mask_g, cal_g, meas_cam_g = _expand_leaf_to_global(
                data_l, jnp.asarray(lc_pad, jnp.int32),
                jnp.asarray(lc_full, jnp.int32), cal, num_images,
            )
            data = SfmData(
                poses=SE3(R=R_g, t=t_g),
                pose_mask=pose_mask_g,
                cal=cal_g,
                points=data_l.points,
                track_mask=data_l.track_mask,
                meas_cam=meas_cam_g,
                meas_track=data_l.meas_track,
                meas_uv=data_l.meas_uv,
                meas_mask=data_l.meas_mask,
                meta=meta,
            )
            aux = m.get("aux", {})
            if aux:
                aux = dict(aux, meas_cam=local_cams[np.asarray(aux["meas_cam"])])
            kp_map = _kp_track_map(aux, num_images, keypoints_xy.shape[1])
            if cache_key is not None:
                self.cluster_cache.put(
                    cache_key,
                    (jax.tree.map(np.asarray, data), kp_map,
                     {k: v for k, v in m.items() if isinstance(v, (int, float, str))}),
                )
            logger.info("  leaf expand: %.1fs", _t.perf_counter() - t_post0)
            return (data, kp_map)

        def fold(node: ClusterTree, child_results):
            child_results = [c for c in child_results if c is not None]
            if node.is_leaf or not child_results:
                if len(node.value):
                    if id(node) in leaf_results:
                        return leaf_results[id(node)]
                    return run_leaf(node)
                return child_results[0] if child_results else None
            if len(child_results) == 1:
                return child_results[0]
            # merge children pairwise, using this node's cut-edge
            # correspondences to find 3D-3D pairs
            result = child_results[0]
            for other in child_results[1:]:
                merged = self._merge_pair(node, result, other, tvr, edges, eindex, meta)
                if merged is None:
                    if not opts.drop_child_if_merging_fail:
                        return None
                    # keep the larger child
                    if other[0].number_tracks() > result[0].number_tracks():
                        result = other
                    metrics.setdefault("merge_failures", 0)
                    metrics["merge_failures"] += 1
                    metrics.setdefault("merge_failure_reasons", []).append(
                        getattr(self, "_last_merge_fail", "unknown")
                    )
                else:
                    result = merged
            return result

        # explicit postorder walk carrying the cluster path so per-node
        # results can be exported as a SceneTree (results/C_1/C_1_2/...
        # layout — products/scene_tree.py:16-164 + common/outputs.py:27-55
        # parity); fold semantics identical to ClusterTree.map_postorder
        self.node_results = []

        import time as _time

        phase_sec = {"leaf": 0.0, "merge": 0.0}

        # leaf pre-pass, largest first: the biggest leaf sets the pad
        # high-water marks, so every later leaf replays its executables
        leaf_results: dict = {}
        for nd in sorted(leaf_nodes, key=lambda x: -len(x.value)):
            t0 = _time.perf_counter()
            leaf_results[id(nd)] = run_leaf(nd)
            dt = _time.perf_counter() - t0
            phase_sec["leaf"] += dt
            logger.info("leaf (%d edges): %.1fs", len(nd.value), dt)

        # seed the merge-BA buckets at their root-level upper bounds (total
        # live tracks/measurements across leaves) so every merge node in
        # the tree — smallest to root — shares ONE compact-BA trace instead
        # of retracing at each level's grown bucket combo
        live = [r for r in leaf_results.values() if r is not None]
        if live:
            from gtsfm_tpu.utils.numerics import ceil_pow2 as _cp2

            tot_t = sum(int(np.asarray(d.track_mask).sum()) for d, _ in live)
            tot_m = sum(int(np.asarray(d.meas_mask).sum()) for d, _ in live)
            self._pad_hwm["ba_cams"] = max(
                self._pad_hwm.get("ba_cams", 0), _cp2(num_images, 8)
            )
            self._pad_hwm["ba_tracks"] = max(
                self._pad_hwm.get("ba_tracks", 0), _cp2(max(tot_t, 16), 16)
            )
            self._pad_hwm["ba_meas"] = max(
                self._pad_hwm.get("ba_meas", 0), _cp2(max(tot_m, 16), 16)
            )

        def walk(node: ClusterTree, path: tuple):
            child_results = [
                walk(c, path + (k + 1,)) for k, c in enumerate(node.children)
            ]
            t0 = _time.perf_counter()
            result = fold(node, child_results)
            phase = "leaf" if (node.is_leaf or not child_results) else "merge"
            dt = _time.perf_counter() - t0
            if not (phase == "leaf" and id(node) in leaf_results):
                phase_sec[phase] += dt
                logger.info(
                    "node %s (%s): %d edges in %.1fs%s",
                    "/".join(map(str, path)) or "root", phase, len(node.value), dt,
                    "" if result is not None else " [FAILED]",
                )
            if result is not None:
                self.node_results.append((path, result[0]))
            return result

        final = walk(tree, ())
        metrics["leaf_mvo_sec"] = round(phase_sec["leaf"], 1)
        metrics["merge_sec"] = round(phase_sec["merge"], 1)
        metrics["cluster_metrics"] = cluster_metrics
        if final is None:
            return SfmData.empty(num_images, meta=meta), {**metrics, "failed": True}
        data, _ = final
        metrics["num_cameras_final"] = data.number_images()
        metrics["num_tracks_final"] = data.number_tracks()
        return data, metrics

    # ------------------------------------------------------------------
    def _merge_pair(self, node, res_a, res_b, tvr, edges, eindex, meta):
        data_a, map_a = res_a
        data_b, map_b = res_b
        cams_a = set(np.nonzero(np.asarray(data_a.pose_mask))[0].tolist())
        cams_b = set(np.nonzero(np.asarray(data_b.pose_mask))[0].tolist())
        if cams_a & cams_b:
            self._last_merge_fail = "overlapping_cameras"
            return None

        ta_parts, tb_parts = [], []
        corr_i1 = np.asarray(tvr["corr_i1"])
        corr_i2 = np.asarray(tvr["corr_i2"])
        corr_mask = np.asarray(tvr["corr_mask"])
        pts_a = np.asarray(data_a.points)
        pts_b = np.asarray(data_b.points)
        # vectorized per cut edge: the (image, kp) -> track maps are dense
        # arrays, so each edge's matches resolve in one numpy gather (the
        # per-match Python loop was the host hotspot at 281-camera scale)
        for a_img, b_img in node.value:
            key = (int(a_img), int(b_img))
            if key not in eindex:
                continue
            e = eindex[key]
            msk = corr_mask[e]
            kp1 = corr_i1[e, msk].astype(np.int64)
            kp2 = corr_i2[e, msk].astype(np.int64)
            i, j = key
            # orient: which child owns image i?
            if i in cams_a and j in cams_b:
                t_a, t_b = map_a[i, kp1], map_b[j, kp2]
            elif i in cams_b and j in cams_a:
                t_b, t_a = map_b[i, kp1], map_a[j, kp2]
            else:
                continue
            ok = (t_a >= 0) & (t_b >= 0)
            ta_parts.append(t_a[ok])
            tb_parts.append(t_b[ok])
        ta = np.concatenate(ta_parts).astype(np.int64) if ta_parts else np.zeros(0, np.int64)
        tb = np.concatenate(tb_parts).astype(np.int64) if tb_parts else np.zeros(0, np.int64)
        # cap the 3D-3D pair count: LMedS+IRLS saturates well below 4k
        # pairs, and an uncapped count gives every merge node its own
        # Sim3-solve bucket (deterministic stride subsample keeps edge
        # coverage roughly uniform)
        MAX_SIM3_PAIRS = 4096
        if len(ta) > MAX_SIM3_PAIRS:
            sel = np.linspace(0, len(ta) - 1, MAX_SIM3_PAIRS).astype(np.int64)
            ta, tb = ta[sel], tb[sel]
        if len(ta) == 0:
            # diagnose: cut edges whose endpoints are not split across the
            # two children indicate cameras dropped below (CC pruning or a
            # cascaded merge failure); map misses indicate filtered tracks
            n_cut = n_orient = 0
            for a_img, b_img in node.value:
                key = (int(a_img), int(b_img))
                if key not in eindex:
                    continue
                n_cut += 1
                i, j = key
                if (i in cams_a and j in cams_b) or (i in cams_b and j in cams_a):
                    n_orient += 1
            self._last_merge_fail = (
                f"no_3d3d_pairs(cut_edges={n_cut}, split_across={n_orient})"
            )
            return None
        merged, mm = merge_children(
            data_a, data_b,
            (pts_a[ta], pts_b[tb], ta, tb),
            self.options.merge, meta=meta,
            pad_hwm=getattr(self, "_pad_hwm", None),
        )
        logger.info(
            "  merge: pairs=%d sim3=%.1fs concat=%.1fs ba=%.1fs",
            len(ta), mm.get("sim3_sec", 0.0), mm.get("concat_sec", 0.0),
            mm.get("ba_sec", 0.0),
        )
        if merged is None:
            self._last_merge_fail = "sim3_failed(pairs=%d inl=%d)" % (
                len(ta), int(mm.get("sim3_inliers", 0)))
            return None
        # rebuild the (image, kp) -> track map for the merged scene; only
        # Sim3-inlier pairs were actually fused by merge_children, so map
        # b-tracks onto a-tracks for inlier pairs only (children own
        # disjoint cameras, so each (image, kp) lives in exactly one map)
        inl = np.asarray(mm.get("sim3_inlier_mask", np.ones(len(ta), bool)), bool)
        offset = data_a.max_tracks
        nb = pts_b.shape[0]
        lut = np.arange(nb, dtype=np.int64) + offset
        lut[tb[inl]] = ta[inl]
        bmask = map_b >= 0
        new_map = np.where(bmask, lut[np.clip(map_b, 0, nb - 1)], map_a)
        # merge_children compacts the merged track axis; compose the
        # old->new permutation so the map indexes the compacted scene
        o2n = mm.get("track_old2new")
        if o2n is not None:
            new_map = np.where(
                new_map >= 0, o2n[np.clip(new_map, 0, len(o2n) - 1)], -1
            )
        return merged, new_map.astype(np.int32)


def _iter_nodes(tree: ClusterTree):
    yield tree
    for c in tree.children:
        yield from _iter_nodes(c)


def _kp_track_map(aux: dict, num_images: int, max_kp: int) -> np.ndarray:
    """Dense (num_images, max_kp) -> track index array from MVO aux arrays
    (-1 = no track). A dense array keeps cross-cluster lookups as single
    numpy gathers instead of per-match dict probes."""
    out = np.full((num_images, max_kp), -1, np.int32)
    if aux:
        out[np.asarray(aux["meas_cam"]), np.asarray(aux["meas_kp"])] = np.asarray(
            aux["meas_track"]
        )
    return out
