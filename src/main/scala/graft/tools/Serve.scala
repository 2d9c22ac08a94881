package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Database
import graft.server.QueryServer

/** Standalone serve CLI — the analog of the reference's `rhydb api`
  * entry point (app/src/api.cpp:36) with its runtime-config layering
  * (src/silo/config/runtime_config.cpp, config/source/): the effective
  * config is built as defaults < default-runtime-config file <
  * runtime-config file < environment < command line, with
  * reference-identical key names where the surface matches.
  *
  * {{{
  * graft.tools.Serve --data-directory /data --api-port 8081
  * GRAFT_API_PORT=8082 graft.tools.Serve --runtime-config runtime.yaml
  * }}}
  *
  * Key paths (YAML form; CLI `--api-max-queued-http-connections`, env
  * `GRAFT_API_MAX_QUEUED_HTTP_CONNECTIONS` derive mechanically, exactly
  * like the reference's CommandLineArguments/EnvironmentVariables
  * `configKeyPathToString`):
  *   - `dataDirectory` — dir holding `database_config.yaml`,
  *     `reference_genomes.json`, `input.ndjson[.zst|.xz]` (preprocessing
  *     input; persisted indexes land under `<dataDirectory>/state`)
  *   - `api.port` (default 8081, like the reference)
  *   - `api.maxQueuedHttpConnections` — request dispatch bound
  *   - `api.estimatedStartupTimeInMinutes` — 503 Retry-After while loading
  *   - `api.softMemoryLimit` — MB; the monitor requests GC above it
  *   - `api.accessLog` — per-request log lines (bool)
  *   - `api.memoryMonitorSeconds` — periodic heap/RSS gauge
  *   - `query.materializationCutoff` — Arrow rows per RecordBatch
  *   - `query.timeoutInSeconds` — per-batch-wait cancellation deadline
  *
  * The server starts BEFORE the database loads (503 + Retry-After until
  * the first build commits — error_request_handler.cpp:30-44) and
  * hot-swaps when the input files change (the directory-watcher
  * contract: the supplier re-fingerprints the input per request and
  * rebuilds only on change).
  */
object Serve {

  /** The recognized dotted key paths (YAML form). */
  val Keys: Seq[String] = Seq(
    "dataDirectory", "runtimeConfig", "defaultRuntimeConfig",
    "api.port", "api.maxQueuedHttpConnections",
    "api.estimatedStartupTimeInMinutes", "api.softMemoryLimit",
    "api.accessLog", "api.memoryMonitorSeconds",
    "query.materializationCutoff", "query.timeoutInSeconds")

  /** camelCase segment → lower-case words (the reference splits key
    * paths the same way for CLI/env rendering).
    */
  private def words(segment: String): Seq[String] =
    segment.split("(?=[A-Z])").toSeq.map(_.toLowerCase)

  /** `api.maxQueuedHttpConnections` → `--api-max-queued-http-connections`
    * (reference CommandLineArguments::configKeyPathToString).
    */
  def cliName(key: String): String =
    "--" + key.split('.').toSeq.flatMap(words).mkString("-")

  /** `api.maxQueuedHttpConnections` → `GRAFT_API_MAX_QUEUED_HTTP_CONNECTIONS`
    * (reference EnvironmentVariables::configKeyPathToString, GRAFT_ for
    * SILO_).
    */
  def envName(key: String): String =
    "GRAFT_" + key.split('.').toSeq.flatMap(words).map(_.toUpperCase)
      .mkString("_")

  private lazy val byCli = Keys.map(k => cliName(k) -> k).toMap
  private lazy val byEnv = Keys.map(k => envName(k) -> k).toMap

  /** Parse `--key value` / `--key=value` args onto dotted keys; boolean
    * keys (`api.accessLog`) may omit the value. Unknown options fail
    * loudly (the reference rejects unknown CLI keys too).
    */
  def parseArgs(args: Seq[String]): Map[String, String] = {
    val boolKeys = Set("api.accessLog")
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case arg :: tail if arg.startsWith("--") =>
          val (name, inline) = arg.indexOf('=') match {
            case -1 => (arg, None)
            case i => (arg.take(i), Some(arg.drop(i + 1)))
          }
          val key = byCli.getOrElse(name,
            sys.error(s"unknown option '$name' (known: ${byCli.keys.toSeq.sorted.mkString(", ")})"))
          inline match {
            case Some(v) => loop(tail, acc + (key -> v))
            case None if boolKeys(key) => tail match {
              // boolean keys accept the space-separated value form too —
              // '--api-access-log true' must not strand an orphan token
              case v :: t2 if v == "true" || v == "false" =>
                loop(t2, acc + (key -> v))
              case _ => loop(tail, acc + (key -> "true"))
            }
            case None => tail match {
              case v :: t2 => loop(t2, acc + (key -> v))
              case Nil => sys.error(s"option '$name' needs a value")
            }
          }
        case other :: _ => sys.error(s"unexpected argument '$other'")
      }
    loop(args.toList, Map.empty)
  }

  /** Env-provided settings (GRAFT_-prefixed, reference ENV_VAR_PREFIX
    * discipline); unknown GRAFT_ variables are ignored rather than fatal
    * (the process env is a shared namespace).
    */
  def parseEnv(env: Map[String, String]): Map[String, String] =
    env.flatMap { case (k, v) => byEnv.get(k).map(_ -> v) }

  /** Flatten a parsed YAML document into dotted keys. */
  private def flattenYaml(node: Any, prefix: String = ""): Map[String, String] =
    node match {
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.flatMap { case (k, v) =>
          flattenYaml(v, if (prefix.isEmpty) k.toString else s"$prefix.$k")
        }.toMap
      case null => Map.empty
      case v => Map(prefix -> v.toString)
    }

  def parseYamlFile(path: String): Map[String, String] = {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val parsed = new org.yaml.snakeyaml.Yaml().load[Any](txt)
    val flat = flattenYaml(parsed)
    flat.keys.find(k => !Keys.contains(k)).foreach(k =>
      sys.error(s"unknown key '$k' in config file $path"))
    flat
  }

  /** The effective settings: defaults < default-config file < config
    * file < env < CLI — the reference's source order
    * (runtime_config.cpp getConfigFilePaths + overwriteFrom sequence).
    * The config-file PATHS themselves resolve from env/CLI first, like
    * the reference's `--runtime-config` option.
    */
  def resolve(args: Seq[String], env: Map[String, String]): Map[String, String] = {
    val cli = parseArgs(args)
    val fromEnv = parseEnv(env)
    val paths = fromEnv ++ cli
    val defaults = Map("api.port" -> "8081")
    val fileLayers =
      paths.get("defaultRuntimeConfig").map(parseYamlFile).getOrElse(Map.empty) ++
        paths.get("runtimeConfig").map(parseYamlFile).getOrElse(Map.empty)
    defaults ++ fileLayers ++ fromEnv ++ cli
  }

  /** Map the resolved settings onto [[QueryServer.ServerConfig]];
    * `accessSink` receives access-log/monitor lines when enabled.
    */
  def serverConfig(m: Map[String, String],
      accessSink: String => Unit = line => println(s"[access] $line"))
      : QueryServer.ServerConfig = {
    val base = QueryServer.ServerConfig()
    QueryServer.ServerConfig(
      arrowBatchRows = m.get("query.materializationCutoff").map(_.trim.toInt)
        .getOrElse(base.arrowBatchRows),
      timeoutSeconds = m.get("query.timeoutInSeconds").map(_.trim.toLong)
        .getOrElse(base.timeoutSeconds),
      maxConnections = m.get("api.maxQueuedHttpConnections").map(_.trim.toInt)
        .getOrElse(base.maxConnections),
      estimatedStartupEnd = m.get("api.estimatedStartupTimeInMinutes")
        .map(min => java.time.Instant.now()
          .plus(java.time.Duration.ofMinutes(min.trim.toLong))),
      accessLog =
        if (m.get("api.accessLog").exists(_.trim.toBoolean)) Some(accessSink)
        else None,
      memoryMonitorSeconds = m.get("api.memoryMonitorSeconds").map(_.trim.toLong),
      softMemoryLimitMb = m.get("api.softMemoryLimit").map(_.trim.toLong))
  }

  /** The input NDJSON under the data directory (plain or compressed). */
  private def inputPath(dataDir: String): String =
    Seq("input.ndjson", "input.ndjson.zst", "input.ndjson.xz")
      .map(n => new java.io.File(dataDir, n))
      .find(_.isFile)
      .map(_.getPath)
      .getOrElse(sys.error(
        s"no input.ndjson[.zst|.xz] under data directory $dataDir"))

  /** Boot the server from resolved settings: starts listening
    * immediately (503 + Retry-After until the first catalog build
    * commits), loads in the background, hot-swaps on input change.
    * Returns the running server; the caller owns `stop()`.
    */
  def boot(spark: SparkSession, m: Map[String, String],
      accessSink: String => Unit = line => println(s"[access] $line"))
      : QueryServer = {
    val dataDir = m.getOrElse("dataDirectory",
      sys.error("dataDirectory is required (--data-directory <dir>)"))
    val ndjson = inputPath(dataDir)
    val inner = QueryServer.cachedSupplier(
      () => Database.inputFingerprint(spark, ndjson),
      _ => Database.build(spark, dataDir, ndjson,
        stateDir = Some(new java.io.File(dataDir, "state").getPath)))
    @volatile var bootFailure: Option[Throwable] = None
    @volatile var ready = false
    val supplier: () => (graft.lang.Planner.Catalog, String) = () => {
      bootFailure.foreach(t => throw new IllegalStateException(
        s"database load failed: ${t.getMessage}", t))
      if (!ready) throw new QueryServer.UninitializedCatalog
      inner()
    }
    val port = m.get("api.port").map(_.trim.toInt).getOrElse(8081)
    val server = new QueryServer(supplier, port, serverConfig(m, accessSink))
    server.start()
    // the loader RETRIES until the first build commits: a transient
    // failure (input still being copied, flaky storage) must not poison
    // the server forever — each attempt's failure is surfaced on stderr
    // AND through the supplier (500s carry the message) until a later
    // attempt succeeds and the normal hot-swap takes over
    val loader = new Thread(() => {
      while (!ready) {
        try { inner(); bootFailure = None; ready = true }
        catch {
          case t: Throwable =>
            bootFailure = Some(t)
            System.err.println(s"[serve] database load failed " +
              s"(retrying in 10s): ${t.getMessage}")
            Thread.sleep(10000)
        }
      }
    }, "graft-serve-bootstrap")
    loader.setDaemon(true)
    loader.start()
    server
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--help")) {
      println("graft.tools.Serve — HTTP query API over a data directory")
      println(Keys.map(k => f"  ${cliName(k)}%-44s ${envName(k)}").mkString("\n"))
      return
    }
    val m = resolve(args.toSeq, sys.env)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-serve")
      .getOrCreate()
    val server = boot(spark, m)
    println(s"[serve] listening on port ${server.boundPort}")
    // serve until killed; the JDK server threads are non-daemon anyway
    Thread.currentThread().join()
  }
}
