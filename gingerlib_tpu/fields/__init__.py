from .fp import (  # noqa: F401
    FpParams, add_mod, sub_mod, neg_mod, double_mod, mont_mul, mont_sqr,
    mont_redc, to_mont, from_mont, pow_const, pow_dyn, inv_mod, legendre,
    sqrt_mod, batch_inverse, fp_from_int, fp_from_ints, fp_to_int, fp_to_ints,
)
