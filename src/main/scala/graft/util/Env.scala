package graft.util

/** Environment configuration accessors (U1).
  *
  * The reference's accessor raises `OSError` naming the missing
  * variable (reference: queue_time_predictions/util.py:4-11) — absent
  * required configuration aborts loudly instead of silently running
  * against a default. `required` is that fail-fast accessor; `orElse`
  * is the explicit-default twin for genuinely optional knobs.
  */
object Env {
  /** Value of `name`, or throw naming the variable (util.py:4-11). */
  def required(name: String): String =
    sys.env.getOrElse(name, throw new IllegalStateException(
      s"Required environment variable not set: $name"))

  /** Value of `name`, or `default` when unset (for optional knobs —
    * the default is stated at the call site, never implicit). */
  def orElse(name: String, default: => String): String =
    sys.env.getOrElse(name, default)
}
