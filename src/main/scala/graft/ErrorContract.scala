package graft

/** The reference's unified failure contract: any unhandled error anywhere
  * prints `system error: <msg>` to stderr and terminates the process with
  * exit code 1 (`/root/reference/MapReduceFramework.cpp:241-247,276-285,
  * 302-308,351-357,370-376` — every failure point funnels through the
  * same message shape). `guard` wraps a main's whole body so Spark/JVM
  * exceptions that escape per-query handling surface exactly the same way.
  *
  * `exit` is injectable so the contract itself is unit-testable
  * (ErrorContractSpec) without killing the test JVM.
  */
object ErrorContract {
  def guard[T](body: => T, exit: Int => Nothing = defaultExit): T =
    try body
    catch {
      case e: Throwable =>
        System.err.println(s"system error: ${Option(e.getMessage).getOrElse(e.toString)}")
        exit(1)
    }

  private def defaultExit(code: Int): Nothing = {
    sys.exit(code)
  }
}
