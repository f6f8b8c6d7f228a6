from .r1cs import (  # noqa: F401
    ConstraintSystem, LinearCombination, SynthesisError, ONE,
    CompiledR1CS, compile_r1cs, eval_matrix,
)
