"""Export/serve roundtrip: serialized forward reproduces live apply."""
import numpy as np
import jax
import jax.numpy as jnp

from fsw_gnn_tpu import FSWGNN, auto_layout, from_edge_index
from fsw_gnn_tpu.serving import load_forward, export_forward


def test_export_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, d_in, d_out = 24, 5, 3
    A = rng.random((n, n)) < 0.2
    np.fill_diagonal(A, False)
    src, dst = np.nonzero(A)
    g = auto_layout(from_edge_index(np.stack([src, dst]), n))
    X = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)

    model = FSWGNN(in_channels=d_in, hidden_dims=(6, d_out),
                   minimize_slice_coherence=False)
    variables = model.init(jax.random.PRNGKey(0), X, g)
    want = np.asarray(model.apply(variables, X, g))

    blob = export_forward(model, variables,
                          jax.ShapeDtypeStruct(X.shape, X.dtype), g)
    assert isinstance(blob, bytes) and len(blob) > 0
    p = tmp_path / 'fswgnn.stablehlo'
    p.write_bytes(blob)

    fwd = load_forward(p.read_bytes())
    got = np.asarray(fwd(X))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
