package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Sensor, SensorType}

/** SENSAPP_* config-surface parity (reference: src/config/mod.rs:9-64):
  * defaults unchanged, overrides honored, byte-size grammar.
  */
class ConfigSpec extends AnyFunSuite {

  private def withProp[A](k: String, v: String)(f: => A): A = {
    val prev = sys.props.get(k)
    sys.props(k) = v
    try f finally prev match {
      case Some(p) => sys.props(k) = p
      case None => sys.props -= k
    }
  }

  test("defaults match the reference (src/config/mod.rs:9-46)") {
    assert(Config.instanceId == 0)
    assert(Config.port == 3000)
    assert(Config.endpoint == "127.0.0.1")
    assert(Config.httpBodyLimit == 10L * 1000 * 1000) // "10mb", decimal
    assert(Config.httpServerTimeoutSeconds == 30L)
    assert(Config.maxInferenceRows == 128)
    assert(Config.batchSize == 8192)
    assert(Config.sensorSalt == "sensapp")
    assert(!Config.influxdbWithNumeric)
    assert(Config.defaultQueryLimit == 10000000)
  }

  test("byte-size grammar: decimal vs binary units, fractions, bare bytes") {
    assert(Config.parseByteSize("1024") == 1024L)
    assert(Config.parseByteSize("10mb") == 10000000L)
    assert(Config.parseByteSize("10MB") == 10000000L)
    assert(Config.parseByteSize("512 KiB") == 512L * 1024)
    assert(Config.parseByteSize("1.5GB") == 1500000000L)
    assert(Config.parseByteSize("2GiB") == 2L * 1024 * 1024 * 1024)
    intercept[IllegalArgumentException](Config.parseByteSize("10 parsecs"))
    intercept[IllegalArgumentException](Config.parseByteSize("mb"))
    // overflow fails loudly — BigDecimal.toLong would keep the low 64
    // bits and a wrapped (possibly negative) cap would sail past the
    // 128 GB ceiling check
    intercept[IllegalArgumentException](
      Config.parseByteSize("99999999999tb"))
    // the reference's 128 GB ceiling (src/config/mod.rs:60-63)
    withProp("SENSAPP_HTTP_BODY_LIMIT", "1tib") {
      intercept[IllegalArgumentException](Config.httpBodyLimit)
    }
  }

  test("overrides are honored and defaults restore on unset") {
    withProp("SENSAPP_MAX_INFERENCES_ROWS", "7") {
      assert(graft.infer.TypeInference.MaxInferenceRows == 7)
    }
    assert(graft.infer.TypeInference.MaxInferenceRows == 128)
    withProp("GRAFT_DEFAULT_QUERY_LIMIT", "42") {
      assert(graft.operators.SensorOps.DefaultQueryLimit == 42)
    }
    assert(graft.operators.SensorOps.DefaultQueryLimit == 10000000)
    withProp("SENSAPP_BATCH_SIZE", "3") {
      assert(Config.batchSize == 3)
    }
  }

  test("SENSAPP_SENSOR_SALT changes the derived UUID keyspace") {
    val base = Sensor.deriveUuid("temp", SensorType.Float, None, Nil)
    withProp("SENSAPP_SENSOR_SALT", "other-tenant") {
      val other = Sensor.deriveUuid("temp", SensorType.Float, None, Nil)
      assert(other != base)
      // explicit-salt call agrees with the env-derived one (memoized key)
      assert(other ==
        Sensor.deriveUuid("temp", SensorType.Float, None, Nil, "other-tenant"))
    }
    assert(Sensor.deriveUuid("temp", SensorType.Float, None, Nil) == base)
  }

  // ---- settings file (SENSAPP_SETTINGS_FILE; reference src/config/mod.rs:50-53)

  private def withSettingsFile[A](content: String)(f: => A): A = {
    val file = java.io.File.createTempFile("graft_settings", ".toml")
    java.nio.file.Files.write(file.toPath, content.getBytes("UTF-8"))
    try withProp("SENSAPP_SETTINGS_FILE", file.getPath)(f)
    finally file.delete()
  }

  test("settings file serves values below env and above defaults " +
    "(reference: confique builder().env().file() order)") {
    withSettingsFile(
      """# graft settings
        |port = 8080
        |http_body_limit = "12345" # wire cap
        |sensor_salt = "file-salt"
        |influxdb_with_numeric = true
        |graft_default_query_limit = 77
        |""".stripMargin) {
      assert(Config.port == 8080)
      assert(Config.httpBodyLimit == 12345L)
      assert(Config.sensorSalt == "file-salt")
      assert(Config.influxdbWithNumeric)
      assert(Config.defaultQueryLimit == 77)
      // defaults still serve for keys the file doesn't carry
      assert(Config.batchSize == 8192)
      // a property (the env tier's test hook) beats the file
      withProp("SENSAPP_PORT", "9090")(assert(Config.port == 9090))
      assert(Config.port == 8080)
    }
    assert(Config.port == 3000)
  }

  test("missing settings file is graceful; defaults serve " +
    "(reference: config/mod.rs:185-198)") {
    withProp("SENSAPP_SETTINGS_FILE", "/nonexistent/never.toml") {
      assert(Config.port == 3000)
      assert(Config.sensorSalt == "sensapp")
    }
  }

  test("malformed settings file fails loudly with a line number") {
    withSettingsFile("port = 8080\nthis is not toml\n") {
      val e = intercept[IllegalArgumentException](Config.port)
      assert(e.getMessage.contains("line 2"))
    }
    withSettingsFile("s = \"unterminated\n") {
      assert(intercept[IllegalArgumentException](Config.port)
        .getMessage.contains("unterminated"))
    }
    withSettingsFile("port = not_a_number\n") {
      assert(intercept[IllegalArgumentException](Config.port)
        .getMessage.contains("number or boolean"))
    }
  }

  test("sectioned keys are namespaced away from top-level fields; " +
    "edits are picked up via mtime") {
    withSettingsFile("[storage]\nport = 1111\n") {
      // [storage].port must NOT shadow the top-level port field
      assert(Config.port == 3000)
      val path = Config.settingsFilePath
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path), "port = 2222\n".getBytes("UTF-8"))
      // ensure a distinct mtime even on coarse-grained filesystems
      new java.io.File(path).setLastModified(
        System.currentTimeMillis() + 1500)
      assert(Config.port == 2222)
    }
  }

  test("string escapes and comments parse the confique way") {
    val m = Config.parseToml(
      "a = \"x\\\"y\\\\z\"\n\n# comment\nb = 1.5 # trailing\nc = \"t\\tn\\n\"")
    assert(m("a") == "x\"y\\z")
    assert(m("b") == "1.5")
    assert(m("c") == "t\tn\n")
  }
}
