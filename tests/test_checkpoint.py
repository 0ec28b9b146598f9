"""Checkpoint round trips: orbax full state + net_%04d.params export."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train import TrainState
from depthinspace_tpu.train.checkpoint import (StateCheckpointer,
                                               save_net_params,
                                               load_net_params,
                                               net_params_path)


def _tiny_state(seed=0):
    model = DispNet(max_disp=32.0)
    x = jnp.zeros((1, 16, 16, 2))
    params = model.init(jax.random.key(seed), x)
    opt = optax.adam(1e-4)
    return model, TrainState.create(params, opt, jax.random.key(7))


def test_orbax_state_roundtrip(tmp_path):
    _, state = _tiny_state()
    # advance rng + step so the save isn't trivial
    state = state.replace(step=jnp.asarray(5, jnp.int32),
                          rng=jax.random.split(state.rng)[0])
    ck = StateCheckpointer(tmp_path, max_to_keep=2)
    np.random.seed(123)
    ck.save(3, state, {"simple": 0.5})
    np.random.seed(999)  # clobber host RNG; restore should bring 123-state back
    _, template = _tiny_state(seed=1)

    restored = ck.restore(template)
    assert restored is not None
    new_state, epoch, min_err = restored
    assert epoch == 3
    assert min_err == {"simple": 0.5}
    assert int(new_state.step) == 5
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(jax.random.key_data(state.rng),
                                  jax.random.key_data(new_state.rng))
    # host RNG restored to the state captured at save time
    a = np.random.rand()
    np.random.seed(123)
    assert a == np.random.rand()
    ck.close()


def test_net_params_export_roundtrip(tmp_path):
    _, state = _tiny_state()
    path = save_net_params(tmp_path, 7, state.params)
    assert path == net_params_path(tmp_path, 7)
    assert path.name == "net_0007.params"
    _, other = _tiny_state(seed=1)
    loaded = load_net_params(path, other.params)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multidataset_concat():
    from depthinspace_tpu.data.dataset import MultiDataset

    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
            self.track_length = 4

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    md = MultiDataset(Fake(3, "a"), Fake(2, "b"))
    assert len(md) == 5
    assert md[0] == ("a", 0)
    assert md[2] == ("a", 2)
    assert md[3] == ("b", 0)
    assert md[4] == ("b", 1)
