"""Oracle check of the grid-scan path at n=2^17 (> _KS_MAX, untested by suite)."""
import numpy as np
import jax.numpy as jnp
from halo2_zkcert_tpu.ops import frops, limbs
from halo2_zkcert_tpu.ops.field import Fr
from halo2_zkcert_tpu.utils import refcrypto as rc

n = 1 << 17
rng = np.random.default_rng(42)
vals = [int(v) for v in rng.integers(1, 2**63, size=n)]

# prefix_product
arr = Fr.from_ints(vals)
out = np.asarray(frops.prefix_product(arr))
acc = 1
ok = True
for i in range(0, n, 4099):
    pass
# full oracle (host, fast enough)
oracle = []
acc = 1
for v in vals:
    acc = acc * v % rc.FR
    oracle.append(acc)
for i in list(range(64)) + [1000, 16383, 16384, 16385, 65536, n - 1]:
    got = int(limbs.limbs_to_int(out[i]) % rc.FR)
    if got != oracle[i]:
        print("prefix_product MISMATCH at", i)
        ok = False
        break
print("prefix_product ok:", ok)

# affine_scan: A[i] = m[i]*A[i-1] + b[i]
ms = [int(v) for v in rng.integers(0, 3, size=n)]  # 0/1/2 like msel
bs = [int(v) for v in rng.integers(0, 2**17, size=n)]
m_l = Fr.from_ints(ms)
b_l = Fr.from_ints(bs)
A = np.asarray(frops.affine_scan(m_l, b_l))
a = 0
orc = []
for m, b in zip(ms, bs):
    a = (m * a + b) % rc.FR
    orc.append(a)
ok = True
for i in list(range(64)) + [1000, 16383, 16384, 16385, 65536, n - 1]:
    got = int(limbs.limbs_to_int(A[i]) % rc.FR)
    if got != orc[i]:
        print("affine_scan MISMATCH at", i, "got", hex(got), "want", hex(orc[i]))
        ok = False
        break
print("affine_scan ok:", ok)

# batch_inv at 2^17
out = np.asarray(frops.batch_inv(arr))
ok = True
for i in [0, 1, 63, 64, 16384, 99999, n - 1]:
    got = int(limbs.limbs_to_int(out[i]) % rc.FR)
    if got != rc.finv(vals[i] % rc.FR, rc.FR):
        print("batch_inv MISMATCH at", i)
        ok = False
        break
print("batch_inv ok:", ok)

# prefix_product_batched (m=3, n=2^17)
m3 = jnp.stack([arr, arr, arr])
outb = np.asarray(frops.prefix_product_batched(m3))
ok = all(int(limbs.limbs_to_int(outb[j, i]) % rc.FR) == oracle[i]
         for j in range(3) for i in [0, 63, 64, 16384, n - 1])
print("prefix_product_batched ok:", ok)
