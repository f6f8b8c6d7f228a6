// gl_host — native host-side big-integer / Montgomery field arithmetic.
//
// The TPU framework's device math lives in Pallas/XLA (gingerlib_tpu/ops);
// this library is the *host runtime* analogue of the reference's unrolled
// u64-limb Montgomery core (algebra/src/fields/models/fp_768.rs and
// biginteger/mod.rs): CRS bookkeeping, witness evaluation, power tables and
// Lagrange coefficients run here at C speed instead of python-int speed.
//
// C ABI, loaded from python via ctypes (gingerlib_tpu/native).  All big
// integers are little-endian u64 limb arrays of a per-field fixed width
// (max 13 limbs = 832 bits, covering every curve in the library).

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

static const int MAX_LIMBS = 13;

extern "C" {

// ---------------------------------------------------------------------------
// raw limb helpers
// ---------------------------------------------------------------------------

static inline u64 adc(u64 a, u64 b, u64 &carry) {
    u128 t = (u128)a + b + carry;
    carry = (u64)(t >> 64);
    return (u64)t;
}

static inline u64 sbb(u64 a, u64 b, u64 &borrow) {
    u128 t = (u128)a - b - borrow;
    borrow = (u64)(-(int64_t)(t >> 64)) & 1;
    return (u64)t;
}

static int cmp_n(const u64 *a, const u64 *b, int n) {
    for (int i = n - 1; i >= 0; --i) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

static void sub_n(u64 *out, const u64 *a, const u64 *b, int n) {
    u64 borrow = 0;
    for (int i = 0; i < n; ++i) out[i] = sbb(a[i], b[i], borrow);
}

static void add_n(u64 *out, const u64 *a, const u64 *b, int n) {
    u64 carry = 0;
    for (int i = 0; i < n; ++i) out[i] = adc(a[i], b[i], carry);
}

// ---------------------------------------------------------------------------
// field context
// ---------------------------------------------------------------------------

struct GlField {
    int n;                  // limbs
    u64 mod[MAX_LIMBS];     // modulus p
    u64 r2[MAX_LIMBS];      // R^2 mod p (R = 2^(64n))
    u64 one[MAX_LIMBS];     // R mod p  (montgomery ONE)
    u64 inv;                // -p^{-1} mod 2^64
};

// CIOS Montgomery multiplication: out = a*b*R^{-1} mod p (fp_768.rs:1009
// dataflow, loop form instead of unrolled).
static void mont_mul_ctx(const GlField *f, const u64 *a, const u64 *b,
                         u64 *out) {
    const int n = f->n;
    u64 t[MAX_LIMBS + 2];
    std::memset(t, 0, sizeof(u64) * (n + 2));
    for (int i = 0; i < n; ++i) {
        u64 carry = 0;
        for (int j = 0; j < n; ++j) {
            u128 v = (u128)a[j] * b[i] + t[j] + carry;
            t[j] = (u64)v;
            carry = (u64)(v >> 64);
        }
        u128 v = (u128)t[n] + carry;
        t[n] = (u64)v;
        t[n + 1] = (u64)(v >> 64);
        u64 m = t[0] * f->inv;
        carry = 0;
        {
            u128 w = (u128)m * f->mod[0] + t[0];
            carry = (u64)(w >> 64);
        }
        for (int j = 1; j < n; ++j) {
            u128 w = (u128)m * f->mod[j] + t[j] + carry;
            t[j - 1] = (u64)w;
            carry = (u64)(w >> 64);
        }
        u128 w = (u128)t[n] + carry;
        t[n - 1] = (u64)w;
        t[n] = t[n + 1] + (u64)(w >> 64);
        t[n + 1] = 0;
    }
    if (t[n] != 0 || cmp_n(t, f->mod, n) >= 0)
        sub_n(out, t, f->mod, n);
    else
        std::memcpy(out, t, sizeof(u64) * n);
}

static void mont_from(const GlField *f, const u64 *a_std, u64 *out) {
    mont_mul_ctx(f, a_std, f->r2, out);
}

static void mont_to_std(const GlField *f, const u64 *a_mont, u64 *out) {
    u64 one_std[MAX_LIMBS];
    std::memset(one_std, 0, sizeof(one_std));
    one_std[0] = 1;
    mont_mul_ctx(f, a_mont, one_std, out);
}

static void add_mod_ctx(const GlField *f, const u64 *a, const u64 *b,
                        u64 *out) {
    const int n = f->n;
    u64 t[MAX_LIMBS + 1];
    u64 carry = 0;
    for (int i = 0; i < n; ++i) t[i] = adc(a[i], b[i], carry);
    t[n] = carry;
    if (t[n] != 0 || cmp_n(t, f->mod, n) >= 0)
        sub_n(out, t, f->mod, n);
    else
        std::memcpy(out, t, sizeof(u64) * n);
}

static void sub_mod_ctx(const GlField *f, const u64 *a, const u64 *b,
                        u64 *out) {
    const int n = f->n;
    if (cmp_n(a, b, n) >= 0) {
        sub_n(out, a, b, n);
    } else {
        u64 t[MAX_LIMBS];
        add_n(t, a, f->mod, n);
        sub_n(out, t, b, n);
    }
}

// out = base^e mod p (montgomery in/out), e as limb array, eb bits
static void pow_ctx(const GlField *f, const u64 *base, const u64 *e,
                    int ebits, u64 *out) {
    const int n = f->n;
    u64 acc[MAX_LIMBS];
    std::memcpy(acc, f->one, sizeof(u64) * n);
    for (int i = ebits - 1; i >= 0; --i) {
        mont_mul_ctx(f, acc, acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1)
            mont_mul_ctx(f, acc, base, acc);
    }
    std::memcpy(out, acc, sizeof(u64) * n);
}

// ---------------------------------------------------------------------------
// public API
// ---------------------------------------------------------------------------

// Initialize a field context in caller-provided storage.
// mod: n limbs; r2: n limbs; one: n limbs (R mod p); inv: -p^{-1} mod 2^64.
void gl_field_init(GlField *f, int n, const u64 *mod, const u64 *r2,
                   const u64 *one, u64 inv) {
    f->n = n;
    std::memcpy(f->mod, mod, sizeof(u64) * n);
    std::memcpy(f->r2, r2, sizeof(u64) * n);
    std::memcpy(f->one, one, sizeof(u64) * n);
    f->inv = inv;
}

int gl_field_size() { return (int)sizeof(GlField); }

// Batched ops on contiguous [count, n]-limb arrays (Montgomery form).
void gl_mont_mul_batch(const GlField *f, const u64 *a, const u64 *b,
                       u64 *out, long count) {
    const int n = f->n;
    for (long i = 0; i < count; ++i)
        mont_mul_ctx(f, a + i * n, b + i * n, out + i * n);
}

void gl_add_mod_batch(const GlField *f, const u64 *a, const u64 *b,
                      u64 *out, long count) {
    const int n = f->n;
    for (long i = 0; i < count; ++i)
        add_mod_ctx(f, a + i * n, b + i * n, out + i * n);
}

void gl_sub_mod_batch(const GlField *f, const u64 *a, const u64 *b,
                      u64 *out, long count) {
    const int n = f->n;
    for (long i = 0; i < count; ++i)
        sub_mod_ctx(f, a + i * n, b + i * n, out + i * n);
}

void gl_to_mont_batch(const GlField *f, const u64 *a_std, u64 *out,
                      long count) {
    const int n = f->n;
    for (long i = 0; i < count; ++i)
        mont_from(f, a_std + i * n, out + i * n);
}

void gl_from_mont_batch(const GlField *f, const u64 *a, u64 *out,
                        long count) {
    const int n = f->n;
    for (long i = 0; i < count; ++i)
        mont_to_std(f, a + i * n, out + i * n);
}

// powers table: out[i] = base^i (standard form in, standard form out),
// i = 0..count-1.  Replaces ops/fft._build_powers' python loop.
void gl_powers(const GlField *f, const u64 *base_std, u64 *out_std,
               long count) {
    const int n = f->n;
    if (count <= 0) return;
    u64 base_m[MAX_LIMBS], acc[MAX_LIMBS];
    mont_from(f, base_std, base_m);
    std::memcpy(acc, f->one, sizeof(u64) * n);
    for (long i = 0; i < count; ++i) {
        mont_to_std(f, acc, out_std + i * n);
        mont_mul_ctx(f, acc, base_m, acc);
    }
}

// scaled powers table: out[i] = scale · base^i mod p, standard form.
// Passing scale = 2^(16·n_digits) mod p yields tables directly in the
// device digit-representation's Montgomery form (ops/limbs 16-bit digits),
// whose radix differs from this library's 64-limb R when the modulus bit
// length is not a multiple of 64.
void gl_powers_scaled(const GlField *f, const u64 *base_std,
                      const u64 *scale_std, u64 *out_std, long count) {
    const int n = f->n;
    if (count <= 0) return;
    u64 base_m[MAX_LIMBS], acc[MAX_LIMBS];
    mont_from(f, base_std, base_m);
    mont_from(f, scale_std, acc);
    for (long i = 0; i < count; ++i) {
        mont_to_std(f, acc, out_std + i * n);
        mont_mul_ctx(f, acc, base_m, acc);
    }
}

// Batch inversion with the Montgomery trick + one Fermat inversion
// (fields/mod.rs:412).  in/out Montgomery form; zero maps to zero.
// exp: p-2 limbs (n limbs), ebits its bit length.
void gl_batch_inverse(const GlField *f, const u64 *a, u64 *out, long count,
                      const u64 *exp, int ebits) {
    const int n = f->n;
    if (count <= 0) return;
    u64 *prefix = new u64[(count + 1) * n];
    std::memcpy(prefix, f->one, sizeof(u64) * n);
    u64 zero[MAX_LIMBS];
    std::memset(zero, 0, sizeof(zero));
    for (long i = 0; i < count; ++i) {
        const u64 *x = a + i * n;
        bool is_zero = true;
        for (int j = 0; j < n; ++j) if (x[j]) { is_zero = false; break; }
        if (is_zero)
            std::memcpy(prefix + (i + 1) * n, prefix + i * n,
                        sizeof(u64) * n);
        else
            mont_mul_ctx(f, prefix + i * n, x, prefix + (i + 1) * n);
    }
    u64 inv_all[MAX_LIMBS];
    pow_ctx(f, prefix + count * n, exp, ebits, inv_all);
    for (long i = count - 1; i >= 0; --i) {
        const u64 *x = a + i * n;
        bool is_zero = true;
        for (int j = 0; j < n; ++j) if (x[j]) { is_zero = false; break; }
        if (is_zero) {
            std::memcpy(out + i * n, zero, sizeof(u64) * n);
        } else {
            mont_mul_ctx(f, inv_all, prefix + i * n, out + i * n);
            mont_mul_ctx(f, inv_all, x, inv_all);
        }
    }
    delete[] prefix;
}

// Lagrange coefficients at tau over the size-m subgroup generated by gen:
// u[i] = Z(tau)/m * gen^i / (tau - gen^i)   (groth16/generator.rs /
// r1cs_to_qap.rs instance map; python mirror proofs/groth16.py
// _host_lagrange_at).  All values standard form.  Returns 0 on success,
// 1 if tau lies in the domain (Z(tau) == 0).
int gl_lagrange_at(const GlField *f, const u64 *gen_std, const u64 *tau_std,
                   const u64 *minv_std, long m, const u64 *exp, int ebits,
                   u64 *out_std) {
    const int n = f->n;
    u64 gen_m[MAX_LIMBS], tau_m[MAX_LIMBS], minv_m[MAX_LIMBS];
    mont_from(f, gen_std, gen_m);
    mont_from(f, tau_std, tau_m);
    mont_from(f, minv_std, minv_m);

    // zt = tau^m - 1
    u64 mexp[MAX_LIMBS];
    std::memset(mexp, 0, sizeof(mexp));
    u64 mm = (u64)m;
    mexp[0] = mm;
    int mbits = 0;
    while (mm) { mbits++; mm >>= 1; }
    u64 zt[MAX_LIMBS];
    pow_ctx(f, tau_m, mexp, mbits, zt);
    sub_mod_ctx(f, zt, f->one, zt);
    bool zt_zero = true;
    for (int j = 0; j < n; ++j) if (zt[j]) { zt_zero = false; break; }
    if (zt_zero) return 1;

    // denominators tau - gen^i, numerator factors zt/m * gen^i
    u64 *den = new u64[m * n];
    u64 *wpow = new u64[m * n];
    u64 w[MAX_LIMBS];
    std::memcpy(w, f->one, sizeof(u64) * n);
    for (long i = 0; i < m; ++i) {
        std::memcpy(wpow + i * n, w, sizeof(u64) * n);
        sub_mod_ctx(f, tau_m, w, den + i * n);
        mont_mul_ctx(f, w, gen_m, w);
    }
    u64 *deninv = new u64[m * n];
    gl_batch_inverse(f, den, deninv, m, exp, ebits);
    u64 ztm[MAX_LIMBS];
    mont_mul_ctx(f, zt, minv_m, ztm);
    for (long i = 0; i < m; ++i) {
        u64 t[MAX_LIMBS];
        mont_mul_ctx(f, ztm, wpow + i * n, t);
        mont_mul_ctx(f, t, deninv + i * n, t);
        mont_to_std(f, t, out_std + i * n);
    }
    delete[] den;
    delete[] wpow;
    delete[] deninv;
    return 0;
}

// Sparse row evaluation: for each row r, out[r] = Σ_k coeff[k]·vals[col[k]]
// over k in [indptr[r], indptr[r+1]).  Everything Montgomery form.
// Replaces ConstraintSystem.eval_lc loops (r1cs/core witness evaluation).
void gl_eval_rows(const GlField *f, const long *indptr, const int *cols,
                  const u64 *coeffs, const u64 *vals, u64 *out,
                  long num_rows) {
    const int n = f->n;
    for (long r = 0; r < num_rows; ++r) {
        u64 acc[MAX_LIMBS];
        std::memset(acc, 0, sizeof(acc));
        for (long k = indptr[r]; k < indptr[r + 1]; ++k) {
            u64 t[MAX_LIMBS];
            mont_mul_ctx(f, coeffs + k * n, vals + (long)cols[k] * n, t);
            add_mod_ctx(f, acc, t, acc);
        }
        std::memcpy(out + r * n, acc, sizeof(u64) * n);
    }
}

}  // extern "C"
