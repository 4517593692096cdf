// hostmath: native host-side runtime for halo2_zkcert_tpu.
//
// The reference stack's layer L1 (halo2curves, Cargo.lock:1359 [dep]) and its
// transcript hashing (poseidon-rs Cargo.lock:2068, keccak [dep]) are native
// Rust; this file is the TPU build's native equivalent for everything that
// runs on the HOST between device kernel launches: 256-bit Montgomery field
// arithmetic, BN254 G1 group ops (incl. fixed-base windowed scalar-mul for
// SRS generation), the Poseidon permutation (round constants/MDS are
// injected from Python, which stays the single source of truth for the
// Grain-LFSR derivation), and Keccak-f1600/Keccak-256 for the EVM
// transcript.
//
// ABI: plain C functions over little-endian 32-byte scalar buffers so the
// Python side binds with ctypes + numpy (no pybind11 in this image).
// Thread-safety: all mutable state is per-context; contexts are initialized
// once at import time from Python.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC hostmath.cpp -o libhostmath.so

#include <cstdint>
#include <cstring>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

// ---------------------------------------------------------------------------
// 256-bit integers as 4 little-endian u64 limbs
// ---------------------------------------------------------------------------

struct U256 {
  u64 v[4];
};

static inline U256 u256_load(const unsigned char *p) {
  U256 r;
  std::memcpy(r.v, p, 32);
  return r;
}

static inline void u256_store(unsigned char *p, const U256 &a) {
  std::memcpy(p, a.v, 32);
}

static inline bool u256_eq(const U256 &a, const U256 &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

static inline bool u256_is_zero(const U256 &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool u256_gte(const U256 &a, const U256 &b) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
  }
  return true;
}

// a += b, returns carry
static inline u64 u256_add(U256 &a, const U256 &b) {
  u128 c = 0;
  for (int i = 0; i < 4; ++i) {
    c += (u128)a.v[i] + b.v[i];
    a.v[i] = (u64)c;
    c >>= 64;
  }
  return (u64)c;
}

// a -= b, returns borrow
static inline u64 u256_sub(U256 &a, const U256 &b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    a.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  return (u64)borrow;
}

// ---------------------------------------------------------------------------
// Montgomery field context (modulus < 2^255, R = 2^256)
// ---------------------------------------------------------------------------

struct FieldCtx {
  U256 p;       // modulus
  U256 r2;      // R^2 mod p
  U256 one_m;   // R mod p (Montgomery 1)
  u64 n0inv;    // -p^{-1} mod 2^64
};

static FieldCtx FQ_CTX, FR_CTX;

static u64 inv64(u64 a) {  // a^{-1} mod 2^64 for odd a (Newton iteration)
  u64 x = a;               // 3 bits
  for (int i = 0; i < 5; ++i) x *= 2 - a * x;
  return x;
}

static void field_init(FieldCtx &ctx, const unsigned char *p_le) {
  ctx.p = u256_load(p_le);
  ctx.n0inv = (u64)(0 - inv64(ctx.p.v[0]));
  // R mod p  (R = 2^256): repeated doubling of (2^255 mod p)... simpler:
  // start from 1, double 256 times mod p.
  U256 r{{1, 0, 0, 0}};
  for (int i = 0; i < 256; ++i) {
    u64 carry = u256_add(r, r);
    if (carry || u256_gte(r, ctx.p)) u256_sub(r, ctx.p);
  }
  ctx.one_m = r;
  // R^2 mod p: double R mod p 256 more times
  U256 r2 = r;
  for (int i = 0; i < 256; ++i) {
    u64 carry = u256_add(r2, r2);
    if (carry || u256_gte(r2, ctx.p)) u256_sub(r2, ctx.p);
  }
  ctx.r2 = r2;
}

// CIOS Montgomery multiplication: returns a*b*R^{-1} mod p
static U256 mont_mul(const FieldCtx &ctx, const U256 &a, const U256 &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    // t += a[i] * b
    u128 c = 0;
    for (int j = 0; j < 4; ++j) {
      c += (u128)t[j] + (u128)a.v[i] * b.v[j];
      t[j] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[4] = (u64)c;
    t[5] = (u64)(c >> 64);
    // m = t[0] * n0inv; t += m * p; t >>= 64
    u64 m = t[0] * ctx.n0inv;
    c = (u128)t[0] + (u128)m * ctx.p.v[0];
    c >>= 64;
    for (int j = 1; j < 4; ++j) {
      c += (u128)t[j] + (u128)m * ctx.p.v[j];
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[3] = (u64)c;
    t[4] = t[5] + (u64)(c >> 64);
    t[5] = 0;
  }
  U256 r{{t[0], t[1], t[2], t[3]}};
  if (t[4] || u256_gte(r, ctx.p)) u256_sub(r, ctx.p);
  return r;
}

static U256 mont_sqr(const FieldCtx &ctx, const U256 &a) {
  return mont_mul(ctx, a, a);
}

static U256 f_add(const FieldCtx &ctx, const U256 &a, const U256 &b) {
  U256 r = a;
  u64 carry = u256_add(r, b);
  if (carry || u256_gte(r, ctx.p)) u256_sub(r, ctx.p);
  return r;
}

static U256 f_sub(const FieldCtx &ctx, const U256 &a, const U256 &b) {
  U256 r = a;
  if (u256_sub(r, b)) u256_add(r, ctx.p);
  return r;
}

static U256 f_neg(const FieldCtx &ctx, const U256 &a) {
  if (u256_is_zero(a)) return a;
  U256 r = ctx.p;
  u256_sub(r, a);
  return r;
}

static U256 to_mont(const FieldCtx &ctx, const U256 &a) {
  return mont_mul(ctx, a, ctx.r2);
}

static U256 from_mont(const FieldCtx &ctx, const U256 &a) {
  U256 one{{1, 0, 0, 0}};
  return mont_mul(ctx, a, one);
}

// a^e mod p (both Montgomery in/out), e as canonical U256
static U256 mont_pow(const FieldCtx &ctx, const U256 &a, const U256 &e) {
  U256 acc = ctx.one_m;
  U256 base = a;
  for (int i = 0; i < 256; ++i) {
    if ((e.v[i / 64] >> (i % 64)) & 1) acc = mont_mul(ctx, acc, base);
    base = mont_sqr(ctx, base);
  }
  return acc;
}

static U256 mont_inv(const FieldCtx &ctx, const U256 &a) {
  // Fermat: a^(p-2)
  U256 e = ctx.p;
  U256 two{{2, 0, 0, 0}};
  u256_sub(e, two);
  return mont_pow(ctx, a, e);
}

// ---------------------------------------------------------------------------
// BN254 G1 (y^2 = x^3 + 3 over Fq), Jacobian coordinates in Montgomery form
// ---------------------------------------------------------------------------

struct G1 {
  U256 X, Y, Z;  // Z == 0 (non-Montgomery zero) means identity
};

static inline bool g1_is_identity(const G1 &p) { return u256_is_zero(p.Z); }

static G1 g1_identity() {
  G1 r;
  std::memset(&r, 0, sizeof(r));
  return r;
}

static G1 g1_double(const G1 &p) {
  const FieldCtx &F = FQ_CTX;
  if (g1_is_identity(p)) return p;
  // dbl-2009-l (a = 0): A=X^2, B=Y^2, C=B^2, D=2((X+B)^2-A-C), E=3A, F=E^2
  U256 A = mont_sqr(F, p.X);
  U256 B = mont_sqr(F, p.Y);
  U256 C = mont_sqr(F, B);
  U256 t = f_add(F, p.X, B);
  t = mont_sqr(F, t);
  t = f_sub(F, t, A);
  t = f_sub(F, t, C);
  U256 D = f_add(F, t, t);
  U256 E = f_add(F, f_add(F, A, A), A);
  U256 Fv = mont_sqr(F, E);
  G1 r;
  r.X = f_sub(F, Fv, f_add(F, D, D));
  U256 c8 = f_add(F, C, C);
  c8 = f_add(F, c8, c8);
  c8 = f_add(F, c8, c8);
  r.Y = f_sub(F, mont_mul(F, E, f_sub(F, D, r.X)), c8);
  U256 yz = mont_mul(F, p.Y, p.Z);
  r.Z = f_add(F, yz, yz);
  return r;
}

static G1 g1_add(const G1 &p, const G1 &q) {
  const FieldCtx &F = FQ_CTX;
  if (g1_is_identity(p)) return q;
  if (g1_is_identity(q)) return p;
  // add-2007-bl
  U256 Z1Z1 = mont_sqr(F, p.Z);
  U256 Z2Z2 = mont_sqr(F, q.Z);
  U256 U1 = mont_mul(F, p.X, Z2Z2);
  U256 U2 = mont_mul(F, q.X, Z1Z1);
  U256 S1 = mont_mul(F, mont_mul(F, p.Y, q.Z), Z2Z2);
  U256 S2 = mont_mul(F, mont_mul(F, q.Y, p.Z), Z1Z1);
  if (u256_eq(U1, U2)) {
    if (u256_eq(S1, S2)) return g1_double(p);
    return g1_identity();
  }
  U256 H = f_sub(F, U2, U1);
  U256 I = f_add(F, H, H);
  I = mont_sqr(F, I);
  U256 J = mont_mul(F, H, I);
  U256 rr = f_sub(F, S2, S1);
  rr = f_add(F, rr, rr);
  U256 V = mont_mul(F, U1, I);
  G1 out;
  out.X = f_sub(F, f_sub(F, f_sub(F, mont_sqr(F, rr), J), V), V);
  U256 s1j = mont_mul(F, S1, J);
  out.Y = f_sub(F, mont_mul(F, rr, f_sub(F, V, out.X)),
                f_add(F, s1j, s1j));
  U256 zz = f_add(F, p.Z, q.Z);
  zz = mont_sqr(F, zz);
  zz = f_sub(F, zz, Z1Z1);
  zz = f_sub(F, zz, Z2Z2);
  out.Z = mont_mul(F, zz, H);
  return out;
}

// mixed add: q affine (Z implicit 1, coords Montgomery); madd-2007-bl
static G1 g1_add_affine(const G1 &p, const U256 &qx, const U256 &qy,
                        bool q_identity) {
  const FieldCtx &F = FQ_CTX;
  if (q_identity) return p;
  if (g1_is_identity(p)) {
    G1 r;
    r.X = qx;
    r.Y = qy;
    r.Z = F.one_m;
    return r;
  }
  U256 Z1Z1 = mont_sqr(F, p.Z);
  U256 U2 = mont_mul(F, qx, Z1Z1);
  U256 S2 = mont_mul(F, mont_mul(F, qy, p.Z), Z1Z1);
  if (u256_eq(p.X, U2)) {
    if (u256_eq(p.Y, S2)) return g1_double(p);
    return g1_identity();
  }
  U256 H = f_sub(F, U2, p.X);
  U256 HH = mont_sqr(F, H);
  U256 I = f_add(F, HH, HH);
  I = f_add(F, I, I);
  U256 J = mont_mul(F, H, I);
  U256 rr = f_sub(F, S2, p.Y);
  rr = f_add(F, rr, rr);
  U256 V = mont_mul(F, p.X, I);
  G1 out;
  out.X = f_sub(F, f_sub(F, f_sub(F, mont_sqr(F, rr), J), V), V);
  U256 yj = mont_mul(F, p.Y, J);
  out.Y = f_sub(F, mont_mul(F, rr, f_sub(F, V, out.X)), f_add(F, yj, yj));
  U256 zz = f_add(F, p.Z, H);
  zz = mont_sqr(F, zz);
  zz = f_sub(F, zz, Z1Z1);
  zz = f_sub(F, zz, HH);
  out.Z = zz;
  return out;
}

// Jacobian (Montgomery) -> affine canonical (little-endian bytes).
// identity -> (0, 0)
static void g1_to_affine_bytes(const G1 &p, unsigned char *out64) {
  const FieldCtx &F = FQ_CTX;
  if (g1_is_identity(p)) {
    std::memset(out64, 0, 64);
    return;
  }
  U256 zinv = mont_inv(F, p.Z);
  U256 zinv2 = mont_sqr(F, zinv);
  U256 zinv3 = mont_mul(F, zinv2, zinv);
  U256 x = from_mont(F, mont_mul(F, p.X, zinv2));
  U256 y = from_mont(F, mont_mul(F, p.Y, zinv3));
  u256_store(out64, x);
  u256_store(out64 + 32, y);
}

static G1 g1_from_affine_bytes(const unsigned char *in64) {
  const FieldCtx &F = FQ_CTX;
  U256 x = u256_load(in64);
  U256 y = u256_load(in64 + 32);
  if (u256_is_zero(x) && u256_is_zero(y)) return g1_identity();
  G1 r;
  r.X = to_mont(F, x);
  r.Y = to_mont(F, y);
  r.Z = F.one_m;
  return r;
}

// ---------------------------------------------------------------------------
// Poseidon permutation (constants injected from Python)
// ---------------------------------------------------------------------------

static int POS_T = 0, POS_RF = 0, POS_RP = 0;
static U256 *POS_RC = nullptr;   // (RF + RP) * T, Montgomery
static U256 *POS_MDS = nullptr;  // T * T, Montgomery

static inline U256 pos_sbox(const U256 &x) {
  const FieldCtx &F = FR_CTX;
  U256 x2 = mont_sqr(F, x);
  U256 x4 = mont_sqr(F, x2);
  return mont_mul(F, x4, x);
}

// ---------------------------------------------------------------------------
// Keccak-f[1600] / Keccak-256 (Ethereum padding 0x01)
// ---------------------------------------------------------------------------

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int KECCAK_R[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55,
                                 20, 3,  10, 43, 25, 39, 41, 45, 15,
                                 21, 8,  18, 2,  61, 56, 14};

static inline u64 rotl64(u64 x, int n) {
  return n ? (x << n) | (x >> (64 - n)) : x;
}

static void keccak_f(u64 st[25]) {
  for (int round = 0; round < 24; ++round) {
    u64 bc[5];
    for (int i = 0; i < 5; ++i)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; ++i) {
      u64 t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    u64 tmp[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) {
        int src = x + 5 * y;
        int dst = y + 5 * ((2 * x + 3 * y) % 5);
        tmp[dst] = rotl64(st[src], KECCAK_R[src]);
      }
    // chi
    for (int j = 0; j < 25; j += 5) {
      u64 row[5];
      for (int i = 0; i < 5; ++i) row[i] = tmp[j + i];
      for (int i = 0; i < 5; ++i)
        st[j + i] = row[i] ^ ((~row[(i + 1) % 5]) & row[(i + 2) % 5]);
    }
    st[0] ^= KECCAK_RC[round];
  }
}

// ---------------------------------------------------------------------------
// Exported C ABI
// ---------------------------------------------------------------------------

extern "C" {

// ---- init ------------------------------------------------------------------

void hm_init(const unsigned char *fq_le, const unsigned char *fr_le) {
  field_init(FQ_CTX, fq_le);
  field_init(FR_CTX, fr_le);
}

// ---- Fr/Fq batch modmul ----------------------------------------------------
// which: 0 = Fq, 1 = Fr. In/out: n scalars of 32 LE bytes, canonical.

void hm_f_mul_batch(int which, const unsigned char *a, const unsigned char *b,
                    unsigned char *out, long n) {
  const FieldCtx &F = which ? FR_CTX : FQ_CTX;
  for (long i = 0; i < n; ++i) {
    U256 am = to_mont(F, u256_load(a + 32 * i));
    U256 bm = to_mont(F, u256_load(b + 32 * i));
    u256_store(out + 32 * i, from_mont(F, mont_mul(F, am, bm)));
  }
}

void hm_f_inv_batch(int which, const unsigned char *a, unsigned char *out,
                    long n) {
  const FieldCtx &F = which ? FR_CTX : FQ_CTX;
  for (long i = 0; i < n; ++i) {
    U256 am = to_mont(F, u256_load(a + 32 * i));
    U256 r = u256_is_zero(am) ? am : mont_inv(F, am);
    u256_store(out + 32 * i, from_mont(F, r));
  }
}

// powers[i] = base^i mod p for i in [0, n)
void hm_f_powers(int which, const unsigned char *base, unsigned char *out,
                 long n) {
  const FieldCtx &F = which ? FR_CTX : FQ_CTX;
  U256 bm = to_mont(F, u256_load(base));
  U256 acc = F.one_m;
  for (long i = 0; i < n; ++i) {
    u256_store(out + 32 * i, from_mont(F, acc));
    acc = mont_mul(F, acc, bm);
  }
}

// ---- G1 --------------------------------------------------------------------
// Affine points: 64 LE bytes (x ‖ y), canonical; (0,0) = identity.

// out = sum_i scalars[i] * points[i]  (naive batch; scalars canonical LE32)
void hm_g1_msm(const unsigned char *points, const unsigned char *scalars,
               unsigned char *out, long n) {
  G1 acc = g1_identity();
  for (long i = 0; i < n; ++i) {
    U256 s = u256_load(scalars + 32 * i);
    if (u256_is_zero(s)) continue;
    G1 base = g1_from_affine_bytes(points + 64 * i);
    G1 term = g1_identity();
    // MSB-first double-and-add
    int top = 255;
    while (top >= 0 && !((s.v[top / 64] >> (top % 64)) & 1)) --top;
    for (int bit = top; bit >= 0; --bit) {
      term = g1_double(term);
      if ((s.v[bit / 64] >> (bit % 64)) & 1) term = g1_add(term, base);
    }
    acc = g1_add(acc, term);
  }
  g1_to_affine_bytes(acc, out);
}

// Fixed-base powers: out[i] = (scalar^i)*G ... NO — SRS wants tau^i * G.
// hm_g1_srs: given base point G and scalar tau, write n affine points
// [G, tau G, tau^2 G, ...] using an 8-bit windowed fixed-base table.
void hm_g1_srs(const unsigned char *g_aff, const unsigned char *tau_le,
               unsigned char *out, long n) {
  const FieldCtx &FRc = FR_CTX;
  // window table: tbl[w][d] = d * 2^(8w) * G, affine Montgomery (via Z=1
  // normalization batch-free: keep Jacobian, use g1_add)
  static const int W = 32;  // 256 / 8
  G1 base = g1_from_affine_bytes(g_aff);
  // precompute tbl in Jacobian (256 entries per window)
  G1 *tbl = new G1[W * 256];
  G1 cur = base;
  for (int w = 0; w < W; ++w) {
    tbl[w * 256 + 0] = g1_identity();
    for (int d = 1; d < 256; ++d)
      tbl[w * 256 + d] = g1_add(tbl[w * 256 + d - 1], cur);
    cur = g1_add(tbl[w * 256 + 255], cur);  // 256 * 2^(8w) G = 2^(8(w+1)) G
  }
  // powers of tau (canonical), then per point: sum over windows
  U256 tau_m = to_mont(FRc, u256_load(tau_le));
  U256 acc_m = FRc.one_m;
  for (long i = 0; i < n; ++i) {
    U256 e = from_mont(FRc, acc_m);  // canonical tau^i
    G1 p = g1_identity();
    for (int w = 0; w < W; ++w) {
      int d = (int)((e.v[w / 8] >> ((w % 8) * 8)) & 0xFF);
      if (d) p = g1_add(p, tbl[w * 256 + d]);
    }
    g1_to_affine_bytes(p, out + 64 * i);
    acc_m = mont_mul(FRc, acc_m, tau_m);
  }
  delete[] tbl;
}

// General fixed-base batch: out[i] = scalars[i] * G via the same 8-bit
// window table (SRS Lagrange-basis generation; scalars canonical LE32).
void hm_g1_fixed_base_many(const unsigned char *g_aff,
                           const unsigned char *scalars, unsigned char *out,
                           long n) {
  static const int W = 32;
  G1 base = g1_from_affine_bytes(g_aff);
  G1 *tbl = new G1[W * 256];
  G1 cur = base;
  for (int w = 0; w < W; ++w) {
    tbl[w * 256 + 0] = g1_identity();
    for (int d = 1; d < 256; ++d)
      tbl[w * 256 + d] = g1_add(tbl[w * 256 + d - 1], cur);
    cur = g1_add(tbl[w * 256 + 255], cur);
  }
  for (long i = 0; i < n; ++i) {
    U256 e = u256_load(scalars + 32 * i);
    G1 p = g1_identity();
    for (int w = 0; w < W; ++w) {
      int d = (int)((e.v[w / 8] >> ((w % 8) * 8)) & 0xFF);
      if (d) p = g1_add(p, tbl[w * 256 + d]);
    }
    g1_to_affine_bytes(p, out + 64 * i);
  }
  delete[] tbl;
}

// pairwise fold: out = sum of n affine points
void hm_g1_sum(const unsigned char *points, unsigned char *out, long n) {
  G1 acc = g1_identity();
  for (long i = 0; i < n; ++i) {
    U256 x = u256_load(points + 64 * i);
    U256 y = u256_load(points + 64 * i + 32);
    bool ident = u256_is_zero(x) && u256_is_zero(y);
    acc = g1_add_affine(acc, to_mont(FQ_CTX, x), to_mont(FQ_CTX, y), ident);
  }
  g1_to_affine_bytes(acc, out);
}

// ---- Poseidon --------------------------------------------------------------

void hm_poseidon_setup(int t, int rf, int rp, const unsigned char *rc_le,
                       const unsigned char *mds_le) {
  POS_T = t;
  POS_RF = rf;
  POS_RP = rp;
  delete[] POS_RC;
  delete[] POS_MDS;
  POS_RC = new U256[(rf + rp) * t];
  POS_MDS = new U256[t * t];
  for (int i = 0; i < (rf + rp) * t; ++i)
    POS_RC[i] = to_mont(FR_CTX, u256_load(rc_le + 32 * i));
  for (int i = 0; i < t * t; ++i)
    POS_MDS[i] = to_mont(FR_CTX, u256_load(mds_le + 32 * i));
}

// state: t scalars of 32 LE bytes, canonical; permuted in place.
// Round structure: full rounds apply sbox to all t elements, partial rounds
// only to element 0; round constants added BEFORE the sbox each round; MDS
// after each round (matches the Python implementation in
// transcript/poseidon.py, which follows the published Poseidon spec).
void hm_poseidon_permute(unsigned char *state) {
  const FieldCtx &F = FR_CTX;
  const int t = POS_T;
  U256 s[8];  // t <= 8
  for (int i = 0; i < t; ++i) s[i] = to_mont(F, u256_load(state + 32 * i));
  const int half = POS_RF / 2;
  int rc_idx = 0;
  U256 tmp[8];
  for (int round = 0; round < POS_RF + POS_RP; ++round) {
    bool full = round < half || round >= half + POS_RP;
    for (int i = 0; i < t; ++i) s[i] = f_add(F, s[i], POS_RC[rc_idx + i]);
    rc_idx += t;
    if (full) {
      for (int i = 0; i < t; ++i) s[i] = pos_sbox(s[i]);
    } else {
      s[0] = pos_sbox(s[0]);
    }
    for (int i = 0; i < t; ++i) {
      U256 acc{{0, 0, 0, 0}};
      for (int j = 0; j < t; ++j)
        acc = f_add(F, acc, mont_mul(F, POS_MDS[i * t + j], s[j]));
      tmp[i] = acc;
    }
    for (int i = 0; i < t; ++i) s[i] = tmp[i];
  }
  for (int i = 0; i < t; ++i) u256_store(state + 32 * i, from_mont(F, s[i]));
}

// ---- Keccak-256 ------------------------------------------------------------

void hm_keccak256(const unsigned char *data, long len, unsigned char *out32) {
  u64 st[25];
  std::memset(st, 0, sizeof(st));
  const long rate = 136;
  long off = 0;
  while (len - off >= rate) {
    for (int i = 0; i < rate / 8; ++i) {
      u64 w;
      std::memcpy(&w, data + off + 8 * i, 8);
      st[i] ^= w;
    }
    keccak_f(st);
    off += rate;
  }
  unsigned char block[136];
  std::memset(block, 0, sizeof(block));
  std::memcpy(block, data + off, len - off);
  block[len - off] = 0x01;  // Keccak (pre-NIST) domain padding
  block[rate - 1] |= 0x80;
  for (int i = 0; i < rate / 8; ++i) {
    u64 w;
    std::memcpy(&w, block + 8 * i, 8);
    st[i] ^= w;
  }
  keccak_f(st);
  std::memcpy(out32, st, 32);
}

}  // extern "C"
