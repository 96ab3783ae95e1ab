<?xml version="1.0" encoding="UTF-8"?>
<!-- Authored test stylesheet in the style of the reference's external
     aggregator_mdx OAI-DC crosswalks: exercises xsl:attribute with
     literal names (the most common previously-refused shape), in the
     three in-subset value forms - constant text, value-of select=".",
     and normalize-space(.) - plus an attributed xsl:element and an
     attributed constant emission. -->
<xsl:stylesheet xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:dcterms="http://purl.org/dc/terms/"
    xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
    version="2.0">
    <xsl:output omit-xml-declaration="yes" method="xml" encoding="UTF-8"/>

    <xsl:template match="text() | @*"/>

    <xsl:template match="//oai_dc:dc">
        <record><xsl:apply-templates /></record>
    </xsl:template>

    <!-- constant attribute + node text content -->
    <xsl:template match="dc:identifier">
        <xsl:if test="normalize-space(.)!=''">
            <identifier><xsl:attribute name="type">url</xsl:attribute><xsl:value-of select="."/></identifier>
        </xsl:if>
    </xsl:template>

    <!-- attribute carrying the node's normalized text, constant content -->
    <xsl:template match="dc:language">
        <language><xsl:attribute name="code"><xsl:value-of select="normalize-space(.)"/></xsl:attribute>mapped</language>
    </xsl:template>

    <!-- attributed xsl:element; two attributes, one from the node -->
    <xsl:template match="dc:title">
        <xsl:if test="normalize-space(.)!=''">
            <xsl:element name="dcterms:title"><xsl:attribute name="lang">en</xsl:attribute><xsl:attribute name="raw"><xsl:value-of select="."/></xsl:attribute><xsl:value-of select="normalize-space(.)"/></xsl:element>
        </xsl:if>
    </xsl:template>

    <!-- plain un-attributed template: mixing both shapes in one sheet -->
    <xsl:template match="dc:subject">
        <subject><xsl:value-of select="normalize-space(.)"/></subject>
    </xsl:template>
</xsl:stylesheet>
