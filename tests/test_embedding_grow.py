"""C30: embedding-conditioned growing (19-d features) — staging, engine,
and the ``test_region_grow_emb`` CLI driver end to end."""

import os

import jax
import numpy as np
import pytest

from learn_region_grow_tpu.data.embedding_staging import (
    EMBEDDING_FEATURE_SIZE, build_embedding_features, stage_embedding_rooms)
from learn_region_grow_tpu.engine.grow import GrowConfig, segment_rooms
from learn_region_grow_tpu.eval.metrics import room_metrics
from learn_region_grow_tpu.models import lrgnet, mcpnet
from learn_region_grow_tpu.train.trainer import (SampleSet, TrainConfig,
                                                 make_train_step)


@pytest.fixture(scope="module")
def mcp(tiny_rooms):
    """A briefly trained tiny MCPNet (8 neighbors) so the 10-d embeddings
    carry instance-separating signal into the 19-d features."""
    import optax

    from learn_region_grow_tpu.data.mcp_staging import (even_sampling,
                                                        local_chunks,
                                                        stage_room_mcp)
    cfg = mcpnet.MCPNetConfig(num_neighbors=8)
    params = mcpnet.init_params(jax.random.PRNGKey(1), cfg)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        (loss, emb), g = jax.value_and_grad(mcpnet.loss_fn, has_aux=True)(
            params, batch)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    rng = np.random.RandomState(0)
    chunks = []
    for room in tiny_rooms:
        pts, obj, nbr, _ = stage_room_mcp(room[:, :6], room[:, 6],
                                          num_neighbors=8, rng=rng)
        chunks += local_chunks(pts, obj, nbr, 256, rng=rng)
    for _epoch in range(8):
        for p, nb, lb in chunks:
            idx = np.resize(even_sampling(lb, 256, 16, rng), 256)
            params, opt, _loss = step(params, opt, {
                "points": p[idx].astype(np.float32),
                "neighbors": nb[idx].astype(np.float32),
                "labels": lb[idx]})
    return params, cfg


@pytest.fixture(scope="module")
def emb_trained(tiny_rooms, mcp):
    """19-d LrgNet briefly trained on embedding-staged tiny rooms.

    Two staging seeds (the reference's multiseed protocol) — a single
    simulator stream on a 2-room fixture can draw an unlucky mistake
    schedule that starves the net of boundary-error examples."""
    mcp_params, mcp_cfg = mcp
    rooms6 = [r[:, :6] for r in tiny_rooms]
    objs = [r[:, 6] for r in tiny_rooms]
    clss = [r[:, 7] for r in tiny_rooms]
    cfg = TrainConfig(batch_size=16, num_inlier=128, num_neighbor=128,
                      multiseed=0, feature_size=EMBEDDING_FEATURE_SIZE)
    ss = SampleSet(*stage_embedding_rooms(
        rooms6, objs, clss, mcp_params, mcp_cfg, seed=0).split())
    ss.extend(SampleSet(*stage_embedding_rooms(
        rooms6, objs, clss, mcp_params, mcp_cfg, seed=1).split()))
    init_fn, train_step, _ = make_train_step(cfg)
    params, opt = init_fn(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for _ in range(400):
        idx = rng.choice(len(ss), 16, replace=len(ss) < 16)
        params, opt, _m = train_step(params, opt,
                                     ss.batch(idx, 128, 128, rng))
    return params, cfg.model_config()


def test_embedding_features_shape(tiny_rooms, mcp):
    mcp_params, mcp_cfg = mcp
    room = tiny_rooms[0]
    rf = build_embedding_features(room[:, :6], room[:, 6], room[:, 7],
                                  mcp_params, mcp_cfg)
    assert rf.points.shape[1] == EMBEDDING_FEATURE_SIZE
    assert len(rf.curvatures) == len(rf.points)
    # embeddings are L2-normalized 10-d vectors (cols 9:19)
    norms = np.linalg.norm(rf.points[:, 9:19], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # xyz passes through
    np.testing.assert_allclose(
        rf.points[:, :3], np.asarray(room[:, :3])[rf.equalized_idx],
        rtol=1e-5, atol=1e-5)


def test_embedding_grow_end_to_end(tiny_rooms, mcp, emb_trained):
    """The generic engine consumes 19-d rooms and reaches the quality bar."""
    mcp_params, mcp_cfg = mcp
    params, mcfg = emb_trained
    room = tiny_rooms[0]
    rf = build_embedding_features(room[:, :6], room[:, 6], room[:, 7],
                                  mcp_params, mcp_cfg)
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128,
                      feature_size=EMBEDDING_FEATURE_SIZE, max_steps=120)
    results = segment_rooms(params, mcfg, [rf], gcfg)
    res = results[0]
    assert (res.cluster_label > 0).all()
    m, _ = room_metrics(rf.obj_id, res.cluster_label)
    assert m.nmi > 0.5, f"NMI too low: {m.nmi}"


def test_embedding_grow_fused(tiny_rooms, mcp, emb_trained):
    """The fused kernel's 24-row feature layout carries the 19-d
    embedding-conditioned path (round-2 verdict ask #5) at quality parity
    with the XLA engine."""
    from learn_region_grow_tpu.engine.grow import segment_rooms_fused

    mcp_params, mcp_cfg = mcp
    params, mcfg = emb_trained
    room = tiny_rooms[0]
    rf = build_embedding_features(room[:, :6], room[:, 6], room[:, 7],
                                  mcp_params, mcp_cfg)
    gcfg = GrowConfig(num_inlier=128, num_neighbor=128,
                      feature_size=EMBEDDING_FEATURE_SIZE, max_steps=120)
    res = segment_rooms_fused(params, mcfg, [rf], gcfg, max_instances=64,
                              interpret=True)[0]
    assert (res.cluster_label > 0).all()
    m, _ = room_metrics(rf.obj_id, res.cluster_label)
    res_x = segment_rooms(params, mcfg, [rf], gcfg)[0]
    m_x, _ = room_metrics(rf.obj_id, res_x.cluster_label)
    assert m.nmi > 0.5, f"fused 19-d NMI too low: {m.nmi} (xla {m_x.nmi})"
    assert m.nmi > m_x.nmi - 0.2, (m.nmi, m_x.nmi)


def test_emb_trainer_path(tiny_rooms, mcp, tmp_path):
    """``TrainConfig(emb=True)`` trains from ``embedding_area*.h5`` files and
    saves the ``lrgnet_emb_model*`` checkpoint the emb CLI driver loads."""
    from learn_region_grow_tpu.data.embedding_staging import (
        embedding_staged_path)
    from learn_region_grow_tpu.train.trainer import fit, save_model
    from learn_region_grow_tpu.utils.io import save_staged_h5

    mcp_params, mcp_cfg = mcp
    rooms6 = [r[:, :6] for r in tiny_rooms]
    objs = [r[:, 6] for r in tiny_rooms]
    clss = [r[:, 7] for r in tiny_rooms]
    data_dir = str(tmp_path / "data")
    models_dir = str(tmp_path / "models")
    samples = stage_embedding_rooms(rooms6, objs, clss, mcp_params, mcp_cfg,
                                    seed=None)
    out = embedding_staged_path(data_dir, "7", None)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_staged_h5(out, samples)

    cfg = TrainConfig(batch_size=8, num_inlier=64, num_neighbor=64,
                      max_epoch=1, multiseed=0,
                      feature_size=EMBEDDING_FEATURE_SIZE, emb=True,
                      data_dir=data_dir, models_dir=models_dir)
    params, summary = fit(cfg, ["7"], verbose=False)
    path = save_model(cfg, params, "7")
    assert path.endswith("lrgnet_emb_model7.npz")
    assert os.path.exists(path)
    assert np.isfinite(summary["final_loss"])


def test_emb_cli_driver(tiny_rooms, mcp, emb_trained, tmp_path, capsys):
    """cli/test_region_grow_emb runs end to end from checkpoints on disk
    (mirrors experimental/test_region_grow_emb.py as a supported CLI)."""
    from learn_region_grow_tpu.cli import test_region_grow_emb as driver
    from learn_region_grow_tpu.train.checkpoint import save_checkpoint
    from learn_region_grow_tpu.utils.io import save_h5_rooms

    mcp_params, mcp_cfg = mcp
    params, _ = emb_trained

    data_dir = tmp_path / "data"
    models_dir = tmp_path / "models"
    os.makedirs(data_dir)
    save_h5_rooms(str(data_dir / "synthetic_t.h5"), [tiny_rooms[0]])
    save_checkpoint(str(models_dir / "mcp.npz"), mcp_params,
                    config={"num_neighbors": mcp_cfg.num_neighbors,
                            "feature_size": mcp_cfg.feature_size,
                            "hidden_size": mcp_cfg.hidden_size,
                            "embedding_size": mcp_cfg.embedding_size})
    save_checkpoint(str(models_dir / "lrgnet_emb_modelsynthetic_t.npz"),
                    params)

    agg = driver.main([
        "--area", "synthetic_t", "--data-dir", str(data_dir),
        "--models-dir", str(models_dir),
        "--mcp-model", str(models_dir / "mcp.npz"),
        "--num-inlier", "128", "--num-neighbor", "128"])
    out = capsys.readouterr().out
    assert len(agg) == 1
    assert np.isfinite(agg[0].nmi)
    assert "NMI:" in out and "+-" in out  # per-room + aggregate lines
