package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Suite-level ScalaTest tag for slow suites (streaming awaits dominate the
 * wall clock on degraded hosts). The default {@code sbt test} run excludes
 * this tag so the gate fits a driver window; {@code GRAFT_FULL_TESTS=1 sbt
 * test} runs everything (see build.sbt).
 */
@org.scalatest.TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface SlowTest {}
