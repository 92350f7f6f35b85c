"""End-to-end tests: HTTP demo server (socket surface) and the interactive
evaluation harness on a synthetic scene."""

import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from point_sam_tpu.models import (
    PointCloudSAM,
    PointSAMConfig,
    TokenizerConfig,
    init_variables,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = PointSAMConfig(
        vit="tiny", tokenizer=TokenizerConfig(num_patches=32, patch_size=8),
        prompt_iters=3,
    )
    model = PointCloudSAM(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    return model, variables


def synth_scene(rng, n=2000, m=3):
    from point_sam_tpu.datasets.synthetic import generate_scene
    from point_sam_tpu.evalsuite.eval_interactive import normalize_scene

    ex = generate_scene(3, num_points=n)
    xyz, rgb = normalize_scene(ex["coords"], ex["features"])
    return xyz, rgb, ex["gt_masks"]


class TestEvalHarness:
    def test_scene_eval_shapes(self, rng, tiny_model):
        model, variables = tiny_model
        from point_sam_tpu.evalsuite.eval_interactive import (
            InteractiveEvaluator,
            filter_masks,
        )

        xyz, rgb, gt = synth_scene(rng)
        keep = filter_masks(gt)
        gt = gt[keep]
        ev = InteractiveEvaluator(
            model, variables, num_clicks=2,
            point_buckets=(4096,), masks_per_batch=2,
        )
        ious = ev.evaluate_scene(xyz, rgb, gt)
        assert ious.shape == (len(gt), 2)
        assert (ious >= 0).all() and (ious <= 1).all()
        # One compiled executable per (bucket, G, K, M) config.
        assert len(ev._fns) == 1

    def test_directory_eval_and_report(self, rng, tiny_model, tmp_path):
        model, variables = tiny_model
        from point_sam_tpu.evalsuite.eval_interactive import evaluate_directory
        from point_sam_tpu.utils.ply import save_ply

        xyz, rgb, gt = synth_scene(rng, n=1500)
        save_ply(tmp_path / "scene0.ply", xyz,
                 np.clip((rgb * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8))
        np.save(tmp_path / "scene0.masks.npy", gt)
        report = evaluate_directory(
            model, variables, tmp_path, num_clicks=2,
        )
        assert set(report["mean_iou_per_click"]) == {1, 2}
        assert report["num_instances"] > 0

    def test_filter_masks(self):
        from point_sam_tpu.evalsuite.eval_interactive import filter_masks

        n = 100
        gt = np.zeros((3, n), bool)
        gt[0, :10] = True       # too small (<25)
        gt[1, :50] = True       # ok
        gt[2, :95] = True       # too big (>=0.9N)
        assert filter_masks(gt).tolist() == [1]


class TestHTTPServer:
    @pytest.fixture()
    def server(self, tiny_model, tmp_path, rng):
        model, variables = tiny_model
        from point_sam_tpu.serving.server import build_server
        from point_sam_tpu.utils.ply import save_ply

        xyz, rgb, _ = synth_scene(rng, n=1200)
        save_ply(tmp_path / "obj.ply", xyz,
                 np.clip((rgb * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8))
        httpd, session = build_server(
            model, variables, port=0, model_dir=tmp_path,
            output_dir=tmp_path / "out",
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}", session
        httpd.shutdown()

    def _post(self, url, path, payload):
        req = urllib.request.Request(
            url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def _get(self, url, path):
        with urllib.request.urlopen(url + path) as r:
            return json.loads(r.read())

    def test_full_click_workflow(self, server):
        url, session = server
        # 1) load cloud
        out = self._get(url, "/pointcloud/obj.ply")
        n = len(out["xyz"]) // 3
        assert n == 1200 and len(out["rgb"]) == 3 * n
        # 2) click twice; second click goes through the mask-prompt path
        xyz0 = out["xyz"][:3]
        seg1 = self._post(url, "/segment",
                          {"prompt_point": xyz0, "prompt_label": 1})
        assert len(seg1["seg"]) == n
        seg2 = self._post(url, "/segment",
                          {"prompt_point": out["xyz"][3:6], "prompt_label": 0})
        assert len(seg2["seg"]) == n
        # 3) next instance + save
        nxt = self._post(url, "/next", {})
        assert nxt["num_instances"] == 1
        saved = self._post(url, "/save", {})
        assert saved["status"] == "saved"
        data = np.load(saved["path"], allow_pickle=True).item()
        assert data["mask"].shape == (1, n)
        # 4) clear works
        assert self._post(url, "/clear", {})["status"] == "cleared"

    def test_browser_sampled_mesh_workflow(self, server, rng):
        """The mesh path: the frontend (static/mesh_sample.js + annotate.js)
        samples a mesh in-browser, normalizes to the unit sphere, and POSTs
        index-keyed point/color objects to /sampled_pointcloud — this
        exercises the exact JSON contract it produces, then clicks."""
        url, session = server
        n = 1000
        xyz = rng.standard_normal((n, 3)).astype(np.float32)
        xyz -= xyz.mean(0)
        xyz /= np.linalg.norm(xyz, axis=1).max()
        rgb = rng.random((n, 3)).astype(np.float32)
        payload = {
            "points": {str(i): float(v) for i, v in enumerate(xyz.reshape(-1))},
            "colors": {str(i): float(v) for i, v in enumerate(rgb.reshape(-1))},
        }
        out = self._post(url, "/sampled_pointcloud", payload)
        assert out["response"] == "success"
        seg = self._post(url, "/segment",
                         {"prompt_point": xyz[0].tolist(), "prompt_label": 1})
        assert len(seg["seg"]) == n
        # static assets for the mesh path are served
        for asset in ("/mesh_sample.js", "/annotate.js", "/"):
            req = urllib.request.Request(url + asset)
            with urllib.request.urlopen(req) as r:
                body = r.read().decode()
            assert r.status == 200
            if asset == "/mesh_sample.js":
                assert "sampleObject" in body
            if asset == "/":
                assert "meshfile" in body

    def test_segment_without_cloud_is_clean_error(self, tiny_model, tmp_path):
        model, variables = tiny_model
        from point_sam_tpu.serving.server import build_server

        httpd, _ = build_server(model, variables, port=0,
                                model_dir=tmp_path, output_dir=tmp_path)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/segment",
                data=json.dumps({"prompt_point": [0, 0, 0],
                                 "prompt_label": 1}).encode(),
                method="POST",
            )
            try:
                urllib.request.urlopen(req)
                assert False, "expected 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "no point cloud" in json.loads(e.read())["error"]
        finally:
            httpd.shutdown()


class TestEvalABFlags:
    """A/B switches for measuring approximation cost (VERDICT r1 #7)."""

    def test_reference_gk_policy(self, rng, tiny_model):
        from point_sam_tpu.evalsuite.eval_interactive import (
            InteractiveEvaluator)

        model, variables = tiny_model
        ev = InteractiveEvaluator(
            model, variables, num_clicks=2, point_buckets=(4096,),
            masks_per_batch=2, gk_policy="reference")
        # eval_kitti.py:350-362: G=min(N,2048), K=256 (K=2 when N<256).
        tok = ev._tokenizer_for(1500)
        assert (tok.num_patches, tok.patch_size) == (1500, 256)
        tok = ev._tokenizer_for(100)
        assert (tok.num_patches, tok.patch_size) == (100, 2)
        tok = ev._tokenizer_for(50_000)
        assert (tok.num_patches, tok.patch_size) == (2048, 256)

    def test_exact_vs_auto_knn_same_result_on_small(self, rng, tiny_model):
        """On CPU/small clouds auto == exact (approx only kicks in on TPU at
        large N), so the A/B harness's two arms must agree exactly here."""
        from point_sam_tpu.evalsuite.eval_interactive import (
            InteractiveEvaluator)

        model, variables = tiny_model
        xyz, rgb, gt = synth_scene(rng, n=1200)
        gt = gt[:2]
        out = {}
        for method in ("auto", "exact"):
            ev = InteractiveEvaluator(
                model, variables, num_clicks=2, point_buckets=(2048,),
                masks_per_batch=2, knn_method=method)
            out[method] = ev.evaluate_scene(xyz, rgb, gt)
        np.testing.assert_allclose(out["auto"], out["exact"], atol=1e-6)
