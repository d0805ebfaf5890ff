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

        def run_leaf(node: ClusterTree):
            """Run MVO on a COMPACTED cluster: cameras remapped to a dense
            pow2-bucketed local index space, edges padded to a pow2 bucket.
            Per-cluster compute then scales with cluster size (not scene
            size) and XLA executables are shared between the many clusters
            of a large scene instead of recompiling per leaf."""
            import jax
            import jax.numpy as jnp

            from gtsfm_tpu.utils.numerics import ceil_pow2

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
            n_local = ceil_pow2(len(local_cams), 8)
            g2l = np.full(num_images, -1, np.int64)
            g2l[local_cams] = np.arange(len(local_cams))
            E_raw = len(sel)
            E_pad = ceil_pow2(E_raw, 8)
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
            )
            cluster_metrics.append({k: v for k, v in m.items() if k != "aux"})
            if m.get("failed"):
                return None
            # expand the local result back to the global camera space
            nl = len(local_cams)
            lc = jnp.asarray(local_cams)
            poses_g = SE3.identity((num_images,))
            poses_g = SE3(
                R=poses_g.R.at[lc].set(data_l.poses.R[:nl]),
                t=poses_g.t.at[lc].set(data_l.poses.t[:nl]),
            )
            pose_mask_g = jnp.zeros(num_images, bool).at[lc].set(
                data_l.pose_mask[:nl]
            )
            cal_g = jax.tree.map(
                lambda g, l: jnp.asarray(g).at[lc].set(l[:nl]), cal, data_l.cal
            )
            data = SfmData(
                poses=poses_g,
                pose_mask=pose_mask_g,
                cal=cal_g,
                points=data_l.points,
                track_mask=data_l.track_mask,
                meas_cam=jnp.asarray(local_cams, jnp.int32)[data_l.meas_cam],
                meas_track=data_l.meas_track,
                meas_uv=data_l.meas_uv,
                meas_mask=data_l.meas_mask,
                meta=meta,
            )
            aux = m.get("aux", {})
            if aux:
                aux = dict(aux, meas_cam=local_cams[np.asarray(aux["meas_cam"])])
            kp_map = _kp_track_map(aux)
            if cache_key is not None:
                self.cluster_cache.put(
                    cache_key,
                    (jax.tree.map(np.asarray, data), kp_map,
                     {k: v for k, v in m.items() if isinstance(v, (int, float, str))}),
                )
            return (data, kp_map)

        def fold(node: ClusterTree, child_results):
            child_results = [c for c in child_results if c is not None]
            if node.is_leaf or not child_results:
                if len(node.value):
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

        def walk(node: ClusterTree, path: tuple):
            child_results = [
                walk(c, path + (k + 1,)) for k, c in enumerate(node.children)
            ]
            t0 = _time.perf_counter()
            result = fold(node, child_results)
            phase = "leaf" if (node.is_leaf or not child_results) else "merge"
            phase_sec[phase] += _time.perf_counter() - t0
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

        pa, pb, ta, tb = [], [], [], []
        corr_i1 = np.asarray(tvr["corr_i1"])
        corr_i2 = np.asarray(tvr["corr_i2"])
        corr_mask = np.asarray(tvr["corr_mask"])
        pts_a = np.asarray(data_a.points)
        pts_b = np.asarray(data_b.points)
        for a_img, b_img in node.value:
            key = (int(a_img), int(b_img))
            if key not in eindex:
                continue
            e = eindex[key]
            mm_ = corr_mask[e]
            for k in np.nonzero(mm_)[0]:
                kp1, kp2 = int(corr_i1[e, k]), int(corr_i2[e, k])
                i, j = key
                # orient: which child owns image i?
                if i in cams_a and j in cams_b:
                    t_a = map_a.get((i, kp1))
                    t_b = map_b.get((j, kp2))
                elif i in cams_b and j in cams_a:
                    t_b = map_b.get((i, kp1))
                    t_a = map_a.get((j, kp2))
                else:
                    continue
                if t_a is None or t_b is None:
                    continue
                pa.append(pts_a[t_a])
                pb.append(pts_b[t_b])
                ta.append(t_a)
                tb.append(t_b)
        if not pa:
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
            (np.asarray(pa), np.asarray(pb), np.asarray(ta), np.asarray(tb)),
            self.options.merge, meta=meta,
        )
        if merged is None:
            self._last_merge_fail = "sim3_failed(pairs=%d inl=%d)" % (
                len(pa), int(mm.get("sim3_inliers", 0)))
            return None
        # rebuild the (image, kp) -> track map for the merged scene; only
        # Sim3-inlier pairs were actually fused by merge_children, so map
        # b-tracks onto a-tracks for inlier pairs only
        new_map = dict(map_a)
        inl = mm.get("sim3_inlier_mask", np.ones(len(ta), bool))
        ta_of_tb = {
            int(t_b): int(t_a) for t_a, t_b, keep in zip(ta, tb, inl) if keep
        }
        offset = data_a.max_tracks
        for (img, kp), t_b in map_b.items():
            new_map[(img, kp)] = ta_of_tb.get(int(t_b), int(t_b) + offset)
        return merged, new_map


def _kp_track_map(aux: dict) -> dict:
    """(image, keypoint) -> track index lookup from MVO aux arrays."""
    out = {}
    if not aux:
        return out
    mc = aux["meas_cam"]
    mk = aux["meas_kp"]
    mt = aux["meas_track"]
    for c, k, t in zip(mc, mk, mt):
        out[(int(c), int(k))] = int(t)
    return out
