"""torch-1.4 optimizer compatibility shim for driving the reference's code.

The reference's two-phase G update (``util_notebook.py:596-694``) calls
``errG_ex.backward()`` through a RETAINED graph whose G weights were already
stepped in phase 1.  On torch 1.4 (the reference's Docker environment,
``/root/reference/Docker``) optimizer writes went through ``p.data`` and did
not bump autograd's version counters, so that backward was legal; modern
torch's in-place ``p.add_`` updates trip the version check with
"one of the variables needed for gradient computation has been modified".

``Adam14`` reproduces the torch-1.4 write discipline so the reference
trainers run unmodified on modern torch — used by the numeric parity tests
(tests/test_trainer_parity.py) and the end-to-end reference-training
evidence tool (scripts/ref_torch_train.py).
"""

import torch


class Adam14(torch.optim.Optimizer):
    """Adam whose parameter writes go through ``p.data`` (no version-counter
    bump), reproducing torch-1.4 optimizers: the reference's phase-2
    ``errG_ex.backward()`` runs through a retained graph whose G weights were
    already stepped in phase 1 — legal on torch 1.4, rejected by modern
    torch's version check unless the update bypasses it like this.  Update
    math follows modern torch/optax eps placement (m_hat/(sqrt(v_hat)+eps));
    torch 1.4's sqrt(v)+eps differs only for |grad| < ~1e-6 where the update
    direction is numerical noise anyway."""

    def __init__(self, params, lr=1e-4, betas=(0.5, 0.999), eps=1e-8):
        super().__init__(params, dict(lr=lr, betas=betas, eps=eps))

    def step(self, closure=None):
        # keep the torch.optim.Optimizer.step(closure=None) contract so LR
        # schedulers / wrappers that pass a closure keep working
        loss = None
        if closure is not None:
            with torch.enable_grad():
                loss = closure()
        with torch.no_grad():
            self._step_impl()
        return loss

    def _step_impl(self):
        for group in self.param_groups:
            b1, b2 = group["betas"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                st = self.state[p]
                if not st:
                    st["step"] = 0
                    st["m"] = torch.zeros_like(p)
                    st["v"] = torch.zeros_like(p)
                st["step"] += 1
                st["m"].mul_(b1).add_(p.grad, alpha=1 - b1)
                st["v"].mul_(b2).addcmul_(p.grad, p.grad, value=1 - b2)
                bc1 = 1 - b1 ** st["step"]
                bc2 = 1 - b2 ** st["step"]
                denom = (st["v"].sqrt() / bc2 ** 0.5).add_(group["eps"])
                p.data.addcdiv_(st["m"], denom, value=-group["lr"] / bc1)
