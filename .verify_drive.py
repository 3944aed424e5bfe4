import time
import jax
print("devices:", jax.devices(), flush=True)

import numpy as np
from plonky_tpu.fields import TWEEDLEDEE_BASE as F, ops as fops
from plonky_tpu.poly import FftPrecomputation, fft, ifft
from plonky_tpu.curves import TWEEDLEDEE, host as chost, ops as cops
from plonky_tpu.hashing import Challenger, blake_hash_usize_to_curve

p = F.p
rng = np.random.default_rng(0)
vals = [p-1, p//2, 1, 0] + [int.from_bytes(rng.bytes(40),"little")%p for _ in range(4)]
rev = list(reversed(vals))
a = fops.from_ints(F, vals); b = fops.from_ints(F, rev)
t0=time.time(); m = fops.jitted('mul', F)(a, b); m.block_until_ready()
got = fops.to_ints(F, m)
ok_mul = all(got[i] == vals[i]*rev[i] % p for i in range(8))
print(f"TPU field mul: {'OK' if ok_mul else 'FAIL'} (compile+run {time.time()-t0:.1f}s)", flush=True)

n=1024
pre = FftPrecomputation(F, n)
coeffs = np.random.default_rng(1).integers(0, 2**31, size=(4, n))
dev = jax.numpy.stack([fops.from_ints(F, c.tolist()) for c in coeffs], axis=1)
t0=time.time()
f = jax.jit(lambda c: fft(pre, c))
vals_d = f(dev); vals_d.block_until_ready()
t_fft = time.time()-t0
back = jax.jit(lambda v: ifft(pre, v))(vals_d)
ok_fft = all(list(fops.to_ints(F, back[:, i])) == [int(x) for x in coeffs[i]] for i in range(4))
print(f"TPU FFT 4x{n} roundtrip: {'OK' if ok_fft else 'FAIL'} (first call {t_fft:.1f}s)", flush=True)
t0=time.time(); f(dev).block_until_ready(); print(f"  cached fft: {time.time()-t0:.3f}s", flush=True)

g = chost.generator(TWEEDLEDEE)
pts = [g, g.double(), chost.zero_point(TWEEDLEDEE), g.neg()]
xs = fops.from_ints(F, [q.x for q in pts]); ys = fops.from_ints(F, [q.y for q in pts])
zm = jax.numpy.asarray(np.array([q.zero for q in pts]))
P = cops.from_affine(TWEEDLEDEE, xs, ys, zm)
S = jax.jit(lambda q: cops.add(TWEEDLEDEE, q, q))(P)
x2, y2, z2 = jax.jit(lambda q: cops.to_affine(TWEEDLEDEE, q))(S)
exp = [chost.add(q, q) for q in pts]
xi = fops.to_ints(F, x2); yi = fops.to_ints(F, y2); zi = np.asarray(z2)
ok_curve = all((e.zero and bool(zi[i])) or (not e.zero and e.x==xi[i] and e.y==yi[i]) for i, e in enumerate(exp))
print(f"TPU curve double (incl. identity): {'OK' if ok_curve else 'FAIL'}", flush=True)

ch = Challenger(F, 128)
pt = blake_hash_usize_to_curve(TWEEDLEDEE, 0)
ch.observe_affine_point(pt)
c1 = ch.get_challenge()
print(f"hash-to-curve valid: {pt.is_valid()}, challenge in range: {0 <= c1 < p}", flush=True)
