"""Full av_expr language tests (libavutil/eval.c parity).

Covers the round-4 additions: st/ld persistent state, while, taylor, root,
bitand/bitor, gcd, random, squish, hyperbolics, lerp, isinf, print, time,
the `^` and `;` operators, hex literals and the dB numeric postfix — plus
the C out-of-domain semantics (nan/inf, never exceptions).
"""
import math

import pytest

from gmat_tpu.filters.expr import compile_expr


def ev(text, **env):
    return compile_expr(text)(env)


# ---- stateful st / ld -------------------------------------------------------

def test_st_returns_value_and_ld_reads_back():
    e = compile_expr("st(3, 42)")
    assert e({}) == 42.0
    assert e.var[3] == 42.0
    assert ev("st(0, 7); ld(0) + 1") == 8.0


def test_st_ld_state_persists_across_calls():
    # the documented ffmpeg scene-cut idiom: select frames >5s apart
    e = compile_expr("gt(scene,0.4)*gt(t-ld(1),5)+st(1,t)*0")
    picks = []
    for t, scene in [(1.0, 0.9), (3.0, 0.9), (8.6, 0.9), (9.0, 0.9)]:
        picks.append(e({"t": t, "scene": scene}) > 0)
    # store happens unconditionally (the trailing +st(1,t)*0), so each
    # frame compares against the previous frame's t: only 8.6-3.0 > 5
    assert picks == [False, False, True, False]


def test_st_index_clipped_to_var_file():
    e = compile_expr("st(99, 5); ld(9)")   # av_clip(idx, 0, 9)
    assert e({}) == 5.0
    assert ev("st(-3, 4); ld(0)") == 4.0


def test_fresh_expr_has_zeroed_vars():
    assert ev("ld(2)") == 0.0


# ---- while / taylor / root --------------------------------------------------

def test_while_accumulates():
    # sum 1..10 via var registers
    r = ev("st(0,0); st(1,0); while(lt(ld(0),10), st(1, ld(1)+st(0,ld(0)+1))); ld(1)")
    assert r == 55.0


def test_while_never_run_is_nan():
    assert math.isnan(ev("while(0, 1)"))


def test_taylor_exp():
    # taylor(expr, x [, id]): sum expr(var)=1/fact -> e^x
    r = ev("st(0,1); taylor(1/st(0, ld(0)*max(ld(1)+st(1,ld(1)+1)*0,1)), 1)")
    # simpler: coefficients of e^x are 1 (expr == 1 constant)
    assert abs(ev("taylor(1, 1)") - math.e) < 1e-9
    assert abs(ev("taylor(1, 2)") - math.e ** 2) < 1e-9


def test_taylor_with_register_id():
    # expr may read the term index from ld(id)
    assert abs(ev("taylor(eq(mod(ld(2),2),0), 1, 2)") - math.cosh(1.0)) < 1e-9


def test_root_finds_positive_root():
    # root of x^2 - 4 on [0, max]: 2
    assert abs(ev("root(ld(0)*ld(0)-4, 10)") - 2.0) < 1e-6
    assert abs(ev("root(sin(ld(0))-0.5, 2)") - math.asin(0.5)) < 1e-6


# ---- bit ops / gcd / random -------------------------------------------------

def test_bitand_bitor():
    assert ev("bitand(12, 10)") == 8.0
    assert ev("bitor(12, 10)") == 14.0
    assert ev("bitand(-1, 255)") == 255.0       # two's complement
    assert math.isnan(ev("bitand(sqrt(-1), 3)"))
    assert math.isnan(ev("bitor(1, sqrt(-1))"))


def test_gcd():
    assert ev("gcd(12, 18)") == 6.0
    assert ev("gcd(-12, 18)") == 6.0
    assert ev("gcd(0, -7)") == -7.0             # av_gcd(0,b) keeps the sign
    assert ev("gcd(5, 0)") == 5.0


def test_random_is_deterministic_lcg():
    e = compile_expr("random(0)")
    r1 = e({})
    r2 = e({})
    assert 0.0 <= r1 <= 1.0 and 0.0 <= r2 <= 1.0
    assert r1 != r2                       # LCG state advanced in var[0]
    # seeded identically -> identical sequence
    f = compile_expr("st(0, 1234); random(0)")
    g = compile_expr("st(0, 1234); random(0)")
    assert f({}) == g({})
    # exact first value from seed 0: (1013904223)/2^64-1 scaled
    h = compile_expr("random(5)")
    assert abs(h({}) - 1013904223 * (1.0 / (2 ** 64 - 1))) < 1e-18


# ---- math additions ---------------------------------------------------------

def test_hyperbolics_lerp_squish_isinf():
    assert abs(ev("sinh(1)") - math.sinh(1)) < 1e-12
    assert abs(ev("cosh(1)") - math.cosh(1)) < 1e-12
    assert abs(ev("tanh(1)") - math.tanh(1)) < 1e-12
    assert ev("lerp(10, 20, 0.25)") == 12.5
    assert abs(ev("squish(0)") - 0.5) < 1e-12
    assert ev("squish(1000)") == 0.0          # exp overflow -> inf -> 0
    assert ev("isinf(1/0)") == 1.0
    assert ev("isinf(42)") == 0.0
    assert abs(ev("atan2(1, 1)") - math.pi / 4) < 1e-12


def test_print_passes_through():
    assert ev("print(3.5) * 2") == 7.0


def test_time_is_wallclock():
    import time
    t0 = time.time()
    v = ev("time()")
    assert abs(v - t0) < 60.0


# ---- operators: ^ ; hex dB --------------------------------------------------

def test_pow_operator():
    assert ev("2^10") == 1024.0
    assert ev("2^3^2") == 64.0            # left-assoc like eval.c
    assert ev("-2^2") == -4.0             # sign binds the whole chain
    assert ev("2^-1") == 0.5
    assert ev("4^0.5") == 2.0


def test_semicolon_returns_last():
    assert ev("1; 2; 3") == 3.0
    assert ev("st(0, 5); ld(0)*2") == 10.0


def test_hex_literals():
    assert ev("0x10") == 16.0
    assert ev("0xff + 1") == 256.0


def test_dB_suffix():
    assert abs(ev("6dB") - 10 ** (6 / 20)) < 1e-12
    # -3dB keeps the sign inside the conversion (eval.c parse_dB)
    assert abs(ev("-3dB") - 10 ** (-3 / 20)) < 1e-12
    assert abs(ev("1*-3dB") - 10 ** (-3 / 20)) < 1e-12
    # binary minus: 1-3dB = 1 - 10^(3/20)
    assert abs(ev("1-3dB") - (1 - 10 ** (3 / 20))) < 1e-12


# ---- C out-of-domain semantics ----------------------------------------------

def test_no_exceptions_out_of_domain():
    assert math.isnan(ev("pow(-2, 0.5)"))
    assert ev("pow(0, -1)") == float("inf")
    assert ev("pow(0, -2)") == float("inf")
    assert ev("exp(10000)") == float("inf")
    assert ev("log(0)") == float("-inf")
    assert math.isnan(ev("log(-1)"))
    assert math.isnan(ev("sqrt(-4)"))
    assert ev("sinh(10000)") == float("inf")
    assert ev("cosh(-10000)") == float("inf")
    assert math.isnan(ev("clip(5, 10, 0)"))   # min>max -> nan (e_clip)


def test_arity_checked_at_parse_time():
    for bad in ["st(1)", "ld()", "while(1)", "lerp(1,2)", "gcd(1)",
                "taylor(1)", "root(1)", "bitand(1)", "time(1)"]:
        with pytest.raises(ValueError):
            compile_expr(bad)


def test_unknown_function_still_rejected():
    with pytest.raises(ValueError):
        compile_expr("nosuchfn(1)")


# ---- round-4 review-fix regressions ----------------------------------------

def test_binary_suffix_all_prefixes():
    # si_prefixes bin_val = 2^(exp*10/3) for EVERY prefix (eval.c:69-104)
    assert abs(ev("1mi") - 2.0 ** -10) < 1e-18
    assert abs(ev("1ui") - 2.0 ** -20) < 1e-24
    assert abs(ev("1ci") - 2.0 ** (-20 / 3.0)) < 1e-12
    assert ev("1Ki") == 1024.0 and ev("1Mi") == 2.0 ** 20


def test_hex_saturates_like_strtoul():
    # strtoul saturation at UINT64_MAX, no OverflowError
    big = "0x" + "F" * 300
    assert ev(big) == float(2 ** 64 - 1)
    assert ev("0x" + "F" * 16) == float(2 ** 64 - 1)


def test_min_max_nan_ternary_semantics():
    # eval.c ternaries are order-dependent under nan
    assert math.isnan(ev("max(2, sqrt(-1))"))
    assert ev("max(sqrt(-1), 2)") == 2.0
    assert math.isnan(ev("min(2, sqrt(-1))"))
    assert ev("min(sqrt(-1), 2)") == 2.0


def test_random_with_inf_seed_never_raises():
    assert 0.0 <= ev("st(0, exp(10000)); random(0)") <= 1.0
    assert 0.0 <= ev("st(0, -1/0); random(0)") <= 1.0


def test_print_level_arg_evaluates():
    # the level expression RUNS (side effects included, like eval.c)
    assert ev("print(5, st(3,40)); ld(3)") == 40.0


def test_qp2lambda_constant():
    assert ev("QP2LAMBDA") == 118.0   # avutil.h:227 FF_QP2LAMBDA


def test_trig_of_inf_is_nan_not_raise():
    """C sin(inf)/cos(inf)/tan(inf) return nan (EDOM flag only);
    math.sin raises ValueError — the wrapper must absorb it so a
    mid-stream select='sin(1/t)' at t==0 can't crash the chain."""
    for fn in ("sin", "cos", "tan"):
        assert math.isnan(ev(f"{fn}(1/0)"))
        assert math.isnan(ev(f"{fn}(-1/0)"))


def test_custom_funcs_hook():
    """compile_expr(funcs=...) — the av_expr funcs1 analog. Builtins
    match first (eval.c parse_primary precedes the funcs1 scan), so a
    caller-supplied 'sin' is shadowed."""
    funcs = {"double": (1, 1, lambda env, x: 2 * x + env.get("bias", 0.0)),
             "sin": (1, 1, lambda env, x: 999.0)}
    e = compile_expr("double(21)", funcs=funcs)
    assert e({}) == 42.0
    assert e({"bias": 1.0}) == 43.0
    assert abs(compile_expr("sin(0)", funcs=funcs)({})) < 1e-12  # builtin
    with pytest.raises(ValueError, match="unknown function"):
        compile_expr("nosuch(1)")
    with pytest.raises(ValueError, match="takes"):
        compile_expr("double(1,2)", funcs=funcs)
