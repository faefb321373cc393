"""Driver-contract smoke for ``__graft_entry__``.

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on a virtual CPU mesh; neither was covered by the
suite, so API drift (model builder rename, Config knob change, return
shape change) would only surface at round end. This test catches it
cheaply: ``entry()`` must return a traceable (fn, args) pair with
[B, answer_size] logits, and ``dryrun_multichip`` must keep its
signature. The full dryrun itself stays the driver's job (it trains
three tasks over two meshes — minutes, not suite material).
"""

import inspect

import jax

import __graft_entry__ as graft


def test_entry_returns_traceable_forward():
    fn, args = graft.entry()
    params, img, ques = args
    assert img.ndim == 3 and ques.ndim == 2
    out = jax.eval_shape(fn, *args)   # trace-only: no device execution
    assert out.shape == (img.shape[0], 3129)


def test_dryrun_multichip_signature():
    sig = inspect.signature(graft.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]
