"""Closed-loop DDIM validation against analytic Gaussian transport.

For x0 ~ N(mu, sigma^2) (elementwise), the Bayes-optimal eps predictor has a
closed form:

    E[eps | x_t] = (x_t - sqrt(a_t) * mu) * sqrt(1 - a_t) / (a_t sigma^2 + 1 - a_t)

and every DDIM update then becomes the LINEAR map x' = A x + B whose
coefficients follow from ddim_step's algebra — so the exact output
mean/std of the whole 50-step loop can be computed by a 50-step scalar
recursion. Sampling through the real jitted scan must land on that
prediction to Monte-Carlo accuracy. This is a systems test of
make_ddim_schedule + add_noise + ddim_step working together that no
reimplemented oracle can fake: a wrong schedule direction, alpha lookup,
offset, or x0/eps algebra moves the moments immediately.

(The transport does NOT reach the target distribution exactly even with
the optimal predictor: the SD2 schedule's terminal alpha_bar(999) ≈ 0.005
is nonzero, so starting from N(0,1) instead of the true x_T marginal
leaves a ~5% mean deficit — the known nonzero-terminal-SNR truncation.
The sanity check below asserts "close to target", the strict check
asserts "equal to the analytic map".)

Reference contract: diffusers 0.24 DDIMScheduler as configured by
stabilityai/stable-diffusion-2-base (reference models/pano/PanoGenerator.py:128-130).
"""
import jax
import jax.numpy as jnp
import numpy as np

from panfusion_tpu.nn.scheduler import ddim_step, make_ddim_schedule


def _optimal_eps(sched, x_t, t, mu, sigma2):
    a = sched.alphas_cumprod[t]
    return (x_t - jnp.sqrt(a) * mu) * jnp.sqrt(1.0 - a) / (a * sigma2 + 1.0 - a)


def _sample(sched, mu, sigma2, n, key):
    x = jax.random.normal(key, (n,))

    def step(x, i):
        t = sched.timesteps[i]
        eps = _optimal_eps(sched, x, t, mu, sigma2)
        return ddim_step(sched, eps, t, x), None

    x, _ = jax.lax.scan(step, x, jnp.arange(sched.num_inference_steps))
    return x


def _analytic_moments(sched, mu, sigma2):
    """Exact (mean, std) of the DDIM output for x_T ~ N(0,1), by iterating
    the per-step linear map x' = A x + B."""
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    ratio = sched.num_train_timesteps // sched.num_inference_steps
    m, s = 0.0, 1.0
    for t in np.asarray(sched.timesteps):
        a = acp[t]
        tp = t - ratio
        ap = acp[tp] if tp >= 0 else float(sched.final_alpha_cumprod)
        c = np.sqrt(1 - a) / (a * sigma2 + 1 - a)
        k = np.sqrt(ap) * np.sqrt(1 - a) / np.sqrt(a) - np.sqrt(1 - ap)
        A = np.sqrt(ap) / np.sqrt(a) - c * k
        B = c * np.sqrt(a) * mu * k
        m = A * m + B
        s = abs(A) * s
    return m, s


def _check(nsteps, mu, sigma, key, mc_tol):
    sched = make_ddim_schedule(nsteps)
    x = np.asarray(_sample(sched, mu, sigma**2, 20000, key))
    em, es = _analytic_moments(sched, mu, sigma**2)
    # strict: the implementation equals its own analytic linear map
    assert abs(x.mean() - em) < mc_tol, (x.mean(), em)
    assert abs(x.std() - es) < mc_tol, (x.std(), es)
    # sanity: the transport lands near the target (within the known
    # nonzero-terminal-SNR truncation, ~5-15% depending on step count)
    assert abs(em - mu) < 0.2 * max(abs(mu), 1.0), (em, mu)
    assert abs(es - sigma) < 0.2 * sigma + 0.05, (es, sigma)


def test_ddim_matches_analytic_transport_50_steps():
    _check(50, mu=2.5, sigma=0.7, key=jax.random.PRNGKey(0), mc_tol=0.02)


def test_ddim_matches_analytic_transport_10_steps():
    """Few-step leading-spacing schedule — catches offset/spacing
    regressions that only show away from the 50-step default."""
    _check(10, mu=-1.0, sigma=1.3, key=jax.random.PRNGKey(1), mc_tol=0.04)


def test_ddim_low_variance_target():
    """The mis-scaled-latent regime (data std 0.2): the sampler itself
    stays exact — fidelity loss with badly normalized latents comes from
    the learned predictor, not from DDIM."""
    _check(50, mu=0.0, sigma=0.2, key=jax.random.PRNGKey(2), mc_tol=0.01)
