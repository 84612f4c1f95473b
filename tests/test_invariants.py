"""debug_validate: the reference's runtime asserts as an explicit validator
(SURVEY §5 — features.py:136-222 congruence, matches.py:82-104 NaN guards)."""

import numpy as np

import jax
import jax.numpy as jnp

from vo_tpu.models.feature_table import (
    STATE_MATCHED,
    STATE_TRIANGULATED,
    debug_validate,
    empty_table,
)


def test_empty_table_valid():
    assert debug_validate(empty_table(32)) == []


def test_nan_keypoint_on_live_slot_flagged():
    t = empty_table(8)
    t = t._replace(
        state=t.state.at[0].set(STATE_MATCHED), xy=t.xy.at[0, 0].set(jnp.nan)
    )
    errs = debug_validate(t)
    assert any("keypoint" in e for e in errs)


def test_nonfinite_landmark_on_triangulated_flagged():
    t = empty_table(8)
    t = t._replace(
        state=t.state.at[1].set(STATE_TRIANGULATED),
        landmark=t.landmark.at[1, 2].set(jnp.inf),
    )
    errs = debug_validate(t)
    assert any("landmark" in e for e in errs)


def test_duplicate_uid_flagged():
    t = empty_table(8)
    t = t._replace(
        state=t.state.at[:2].set(STATE_MATCHED), uid=t.uid.at[:2].set(7)
    )
    errs = debug_validate(t)
    assert any("uid" in e for e in errs)


def test_pipeline_states_stay_valid():
    """After bootstrap + steps on synthetic frames, invariants must hold —
    the same guarantee the reference's asserts enforce every frame."""
    from vo_tpu.models.pipeline import bootstrap, vo_step
    from vo_tpu.utils.config import DetectorConfig, KLTConfig, VOConfig

    cfg = VOConfig(
        capacity=64,
        detector=DetectorConfig(border=8, nms_radius=4),
        klt=KLTConfig(pyramid_levels=2, radius=4),
    )
    key = jax.random.PRNGKey(0)
    base = 127.0 + 40.0 * jax.random.normal(key, (72, 96), jnp.float32)
    imgs = [jnp.roll(base, (i, 2 * i), axis=(0, 1)) for i in range(6)]
    K = jnp.asarray([[80.0, 0, 48.0], [0, 80.0, 36.0], [0, 0, 1.0]], jnp.float32)
    state, _ = bootstrap(imgs[0], imgs[2], K, cfg, jax.random.PRNGKey(7))
    assert debug_validate(state.table) == []
    for i in range(3, 6):
        state, _ = vo_step(state, imgs[i], K, cfg)
        assert debug_validate(state.table) == []
