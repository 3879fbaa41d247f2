package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Env

/** U1 env accessor parity (reference util.py:4-11: get_env raises
  * naming the missing variable). */
class EnvSpec extends AnyFunSuite {

  test("required: returns the value when set") {
    val (k, v) = sys.env.head
    assert(Env.required(k) === v)
  }

  test("required: throws naming the missing variable (fail fast)") {
    val e = intercept[IllegalStateException](
      Env.required("GRAFT_DEFINITELY_NOT_SET_92617"))
    assert(e.getMessage.contains("GRAFT_DEFINITELY_NOT_SET_92617"))
  }

  test("orElse: stated default only when unset") {
    assert(Env.orElse("GRAFT_DEFINITELY_NOT_SET_92617", "fallback") === "fallback")
    val (k, v) = sys.env.head
    assert(Env.orElse(k, "fallback") === v)
  }
}
