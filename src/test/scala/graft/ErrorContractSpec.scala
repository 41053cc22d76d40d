package graft

import java.io.{ByteArrayOutputStream, PrintStream}

import org.scalatest.funsuite.AnyFunSuite

/** The reference's unified error contract
  * (`/root/reference/MapReduceFramework.cpp:241-247`): every failure path
  * prints `system error: <msg>` to stderr and exits 1. `ErrorContract.guard`
  * wraps the Verify/Bench mains; here we pin the message shape and the
  * exit code with an injected exit so the test JVM survives.
  */
class ErrorContractSpec extends AnyFunSuite {

  private final case class Exited(code: Int) extends RuntimeException

  test("guard passes through the result of a successful body") {
    assert(ErrorContract.guard(41 + 1) == 42)
  }

  test("guard prints 'system error: <msg>' to stderr and exits 1 on failure") {
    val buf = new ByteArrayOutputStream()
    val old = System.err
    System.setErr(new PrintStream(buf, true, "UTF-8"))
    val thrown =
      try {
        intercept[Exited] {
          ErrorContract.guard[Int](
            throw new IllegalStateException("shuffle directory vanished"),
            code => throw Exited(code))
        }
      } finally System.setErr(old)
    assert(thrown.code == 1)
    val err = buf.toString("UTF-8")
    assert(err.startsWith("system error: "), err)
    assert(err.contains("shuffle directory vanished"), err)
  }

  test("guard handles exceptions with null messages") {
    val buf = new ByteArrayOutputStream()
    val old = System.err
    System.setErr(new PrintStream(buf, true, "UTF-8"))
    val thrown =
      try {
        intercept[Exited] {
          ErrorContract.guard[Int](
            throw new NullPointerException(),
            code => throw Exited(code))
        }
      } finally System.setErr(old)
    assert(thrown.code == 1)
    assert(buf.toString("UTF-8").startsWith("system error: "), buf.toString("UTF-8"))
  }
}
